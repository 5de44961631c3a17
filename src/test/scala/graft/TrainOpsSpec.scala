package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Validation for the unoracled SimHash near-dedup (l1): xxhash64 is
  * engine-internal, so correctness is pinned behaviourally — identical
  * texts get identical signatures (Hamming 0), exact-duplicate pairs land
  * in one cluster, and the banded join must not degenerate to all-pairs. */
class TrainOpsSpec extends AnyFunSuite {
  import TestSpark._

  private val sfDup = "/root/testdata/sf0.1" // only tier with exact text dups

  test("l1: exact-duplicate texts share a simhash cluster") {
    val out = SparkEntry.queries("l1_dedup_simhash")(spark, sfDup)
    val docs = spark.read.parquet(s"$sfDup/documents.parquet")
      .select(col("doc_id"), sha2(col("text"), 256).as("dig"))
    val dupPairs = docs.as("a").join(docs.as("b"),
        col("a.dig") === col("b.dig") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("x"), col("b.doc_id").as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(dupPairs.nonEmpty, "sf0.1 should contain exact dup texts")

    val rows = out.collect()
    val cluster = rows.map(r => r.getLong(0) -> r.getLong(2)).toMap
    val sig = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    dupPairs.foreach { case (x, y) =>
      assert(sig(x) == sig(y), s"identical texts $x/$y differ in simhash")
      assert(cluster(x) == cluster(y), s"identical texts $x/$y not clustered")
    }
    val merged = rows.count(r => r.getLong(0) != r.getLong(2))
    assert(merged < rows.length / 10,
      s"$merged of ${rows.length} docs marked near-dup — degenerate banding")
  }

  test("broadcast guard fails loudly past MaxBroadcastRows, passes under it") {
    val big = spark.range(operators.LlmOps.MaxBroadcastRows + 1).toDF("vec_id")
    val ex = intercept[IllegalArgumentException] {
      operators.LlmOps.requireBroadcastable(big, "test table", "the-scale-path")
    }
    assert(ex.getMessage.contains("the-scale-path"),
      s"guard message must point at the scale path: ${ex.getMessage}")
    val ok = spark.range(10).toDF("vec_id")
    assert(operators.LlmOps.requireBroadcastable(ok, "t", "p") eq ok,
      "in-cap side must pass through unchanged")
  }

  test("l3: IVF ANN recall vs the exact top-10 (j4) is useful, not just self-consistent") {
    val ivf = SparkEntry.queries("l3_ann_ivf_topk")(spark, sfTiny)
      .collect().map(_.getLong(0)).toSet
    val exact = SparkEntry.queries("j4_sim_knn_query")(spark, sfTiny)
      .collect().map(_.getLong(0)).toSet
    val recall = (ivf & exact).size.toDouble / exact.size
    assert(recall >= 0.6, s"IVF recall $recall (probing 4/16 cells)")
  }
}

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

  test("l12: planted cosine near-dups cluster with high recall; chains close; strangers stay apart") {
    import scala.collection.JavaConverters._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // exact geometry via plane rotation: A = u, B = rot(t), C = rot(2t) in
    // the u-w plane, so cos(A,B) = cos(B,C) = cos(t) and cos(A,C) = cos(2t)
    val rnd = new scala.util.Random(42)
    def unit(): Array[Double] = {
      val v = Array.fill(64)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    def orthTo(u: Array[Double]): Array[Double] = {
      val w0 = unit()
      val d = u.zip(w0).map { case (a, b) => a * b }.sum
      val w = w0.zip(u).map { case (a, b) => a - d * b }
      val n = math.sqrt(w.map(x => x * x).sum)
      w.map(_ / n)
    }
    def rot(u: Array[Double], w: Array[Double], t: Double): Seq[Float] =
      u.zip(w).map { case (a, b) => (math.cos(t) * a + math.sin(t) * b).toFloat }.toSeq

    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Float])]
    // chain: cos(t) ≈ 0.985 >= 0.98 per hop, cos(2t) ≈ 0.94 < 0.98 across
    val t = math.acos(0.985)
    val cu = unit(); val cw = orthTo(cu)
    rows += ((0L, rot(cu, cw, 0))); rows += ((1L, rot(cu, cw, t)))
    rows += ((2L, rot(cu, cw, 2 * t)))
    // 20 planted near-dup pairs at cos ≈ 0.995
    val tp = math.acos(0.995)
    for (k <- 0 until 20) {
      val u = unit(); val w = orthTo(u)
      rows += ((1000L + 2 * k, rot(u, w, 0)))
      rows += ((1001L + 2 * k, rot(u, w, tp)))
    }
    // 50 unrelated vectors (random 64-d cosines stay far below 0.98)
    for (i <- 0 until 50) rows += ((100L + i, unit().map(_.toFloat).toSeq))

    val schema = StructType(Seq(StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false))))
    val df = spark.createDataFrame(
      rows.map { case (id, v) => Row(id, v) }.asJava, schema)
    val out = operators.TrainOps.embeddingNearDups(df, 0.98).collect()
    val cluster = out.map(r => r.getLong(0) -> r.getLong(1)).toMap

    // chain closure: A~B and B~C must put A and C in ONE cluster even
    // though cos(A,C) < threshold
    assert(cluster(0L) == cluster(1L) && cluster(1L) == cluster(2L),
      s"chain not closed: ${cluster(0L)}/${cluster(1L)}/${cluster(2L)}")
    // recall over the planted pairs (SRP banding: expected ~0.999 each)
    val hit = (0 until 20).count(k => cluster(1000L + 2 * k) == cluster(1001L + 2 * k))
    assert(hit >= 18, s"planted-pair recall $hit/20 below 0.9")
    // precision: unrelated vectors must stay singletons
    val strangers = out.filter(_.getLong(0) >= 100L).filter(_.getLong(0) < 1000L)
    assert(strangers.forall(r => r.getLong(1) == r.getLong(0) && r.getLong(2) == 0L),
      "an unrelated vector was merged into a near-dup cluster")
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

package graft

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2.J's promised validation for j2_dedup_near_minhash: the
  * LSH-clustered output must recover ≥90% of the EXACT word-3-gram-shingle
  * Jaccard ≥ 0.8 pairs (computed brute-force here at sf0.001 — 500 docs),
  * and must not merge unrelated docs. */
class LshSpec extends AnyFunSuite {
  import TestSpark._

  private def shingles(text: String): Set[Seq[String]] = {
    val ws = text.toLowerCase.split("[^a-z]+").filter(_.nonEmpty).toSeq
    ws.sliding(3).filter(_.size == 3).map(_.toSeq).toSet
  }

  test("j2: LSH cluster recall >= 0.9 vs exact shingle-Jaccard pairs") {
    val docs = spark.read.parquet(s"$sfTiny/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> shingles(r.getString(1))).toMap
    val ids = docs.keys.toSeq.sorted
    val exactPairs = for {
      i <- ids.indices
      j <- (i + 1) until ids.size
      a = docs(ids(i)); b = docs(ids(j))
      if a.nonEmpty && b.nonEmpty &&
        (a & b).size.toDouble / (a | b).size >= 0.8
    } yield (ids(i), ids(j))
    assert(exactPairs.nonEmpty, "fixture should contain planted near-dups")

    val cluster = SparkEntry.queries("j2_dedup_near_minhash")(spark, sfTiny)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val recalled = exactPairs.count { case (a, b) => cluster(a) == cluster(b) }
    val recall = recalled.toDouble / exactPairs.size
    assert(recall >= 0.9, s"recall $recall over ${exactPairs.size} exact pairs")

    // precision sanity: docs put in the same non-trivial cluster must
    // really be similar (no all-pairs degeneration as in the unigram bug)
    val merged = cluster.toSeq.filter { case (d, c) => d != c }
    merged.foreach { case (d, c) =>
      val a = docs(d); val b = docs(c)
      val jac = (a & b).size.toDouble / (a | b).size
      assert(jac >= 0.5, s"docs $d and $c clustered but Jaccard only $jac")
    }
    assert(merged.size < docs.size / 2,
      s"${merged.size} of ${docs.size} docs marked near-dup — degenerate LSH")
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.LlmOps

/** Scratch volume probe for the prefix-index dedup family (deleted
  * before round close): how many candidate pairs does the bipartite /
  * self prefix join emit vs how many survive exact verification, and
  * would the lossless PPJoin length filter (5·min(n) >= 4·max(n) at
  * J >= 4/5) prune a meaningful share before set-attach?
  */
object ProbeL18 {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.local.dir", "/dev/shm/graft_spark")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shing = LlmOps.shingleRows(spark, d).localCheckpoint(eager = true)
    val sizes = shing.groupBy("doc_id").agg(count(lit(1)).as("n"))
      .localCheckpoint(eager = true)
    // rebuild the l9-style prefix index inline (kernel is private)
    val dfreq = shing.groupBy("shingle").agg(count(lit(1)).as("df"))
    val wDoc = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
    val pref = shing.join(dfreq, "shingle")
      .withColumn("n", count(lit(1)).over(wDoc))
      .withColumn("rk", row_number().over(
        wDoc.orderBy(col("df"), col("shingle"))))
      .filter(col("rk") <= col("n") - expr("(4 * n + 4) div 5") + 1)
      .select("doc_id", "shingle")
      .localCheckpoint(eager = true)
    // l9-style self-join candidates
    val cand = pref.as("a").join(pref.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
      .localCheckpoint(eager = true)
    val nCand = cand.count()
    System.err.println(s"PROBE n_cand $nCand")
    val withN = cand
      .join(sizes.select(col("doc_id").as("a_id"), col("n").as("na")), "a_id")
      .join(sizes.select(col("doc_id").as("b_id"), col("n").as("nb")), "b_id")
    val nLenOk = withN
      .filter(least(col("na"), col("nb")) * 5 >=
        greatest(col("na"), col("nb")) * 4)
      .count()
    System.err.println(s"PROBE n_len_ok $nLenOk (length filter keeps " +
      f"${100.0 * nLenOk / math.max(nCand, 1)}%.1f%%)")
    spark.stop()
  }
}

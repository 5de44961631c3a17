package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-smoke harness for the dedup/similarity stack:
  * `runMain graft.ScaleSmoke [factor] [keys...]`.
  *
  * Clones `documents` (and `embeddings`) `factor`× into tmpfs — each clone
  * keeps the original text plus one clone-unique suffix token, so every
  * original doc becomes a NEAR-duplicate cluster of `factor` members.
  * This is the adversarial shape for dedup at scale: candidate-pair count
  * and component sizes grow with the duplication rate, not just the row
  * count. A dedup operator whose fan-out is bounded (banded LSH, prefix
  * filtering, bucketed bands) should scale near-linearly in total rows
  * here; an all-pairs formulation blows up quadratically and times out.
  *
  * Emits one JSON line per run: {"factor":N,"rows":R,"queries":{k:sec}}
  * — compare against the factor-1 run (or BENCH_r*.json) to see the
  * scaling exponent. Not part of the oracle gate; a design probe.
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(8)
    val keys = if (args.length > 1) args.drop(1).toSeq
      else Seq("j1_dedup_exact", "j2_dedup_near_minhash", "l1_dedup_simhash",
        "l9_dedup_ngram_jaccard", "l10_split_train_eval")
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.local.dir", "/dev/shm/graft_spark")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = Tables.scratch(spark, src, s"scale_smoke_x$factor")
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val n = docs.agg(max("doc_id")).head().getLong(0) + 1
    val cloned = docs.crossJoin(
        spark.range(factor.toLong).select(col("id").as("clone")))
      .select(
        (col("doc_id") + col("clone") * n).as("doc_id"),
        // one clone-unique token appended: clones of one doc stay NEAR
        // duplicates of each other (J just under 1) without being exact
        concat(col("text"), lit(" clonetok"), col("clone")).as("text"),
        col("lang"), col("source"), col("n_chars"))
    cloned.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    spark.read.parquet(s"$src/embeddings.parquet")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = spark.read.parquet(s"$dir/documents.parquet").count()

    val times = keys.map { k =>
      val t0 = System.nanoTime()
      SparkEntry.queries(k)(spark, dir).queryExecution.toRdd.count()
      k -> (System.nanoTime() - t0) / 1e9
    }
    val qs = times.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    println(s"""{"factor":$factor,"rows":$rows,"queries":$qs}""")
    spark.stop()
  }
}

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
  *
  * `SPARK_GRAFT_LAYOUT=lang` writes the cloned documents PARTITIONED BY
  * lang — the partition-pruned lake layout of §7.5 — instead of flat
  * files: the same dedup stack must run unchanged over the partitioned
  * directory (readers reconstruct `lang` from directory names), and a
  * lang-scoped read must prune partitions (assert-checked here at probe
  * time; regression-pinned in PlanShapeSpec).
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(8)
    val keys = if (args.length > 1) args.drop(1).toSeq
      else Seq("j1_dedup_exact", "j2_dedup_near_minhash", "l1_dedup_simhash",
        "l9_dedup_ngram_jaccard", "l10_split_train_eval", "l12_dedup_embedding",
        "l17_pipeline_corpus_prep")
    // fail on typos BEFORE the expensive factor-x clone below
    val unknown = keys.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown query keys: ${unknown.mkString(", ")}")
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
    // clone-unique suffix must be LETTERS-ONLY and shingle-reaching: the
    // tokenizer splits on [^a-z]+ (digits vanish — "clonetok0" and
    // "clonetok1" would both tokenize to "clonetok", making clones EXACT
    // token-space duplicates). Three distinct letter tokens perturb the
    // tail shingles so clones are genuine near-dups (J just under 1).
    val cloneTok = expr(
      """concat(' zz',
           ' q', chr(ascii('a') + clone % 26),
           ' q', chr(ascii('a') + (clone div 26) % 26),
           ' q', chr(ascii('a') + (clone div 676) % 26))""")
    val cloned = docs.crossJoin(
        spark.range(factor.toLong).select(col("id").as("clone")))
      .select(
        (col("doc_id") + col("clone") * n).as("doc_id"),
        concat(col("text"), cloneTok).as("text"),
        col("lang"), col("source"), col("n_chars"))
    val layout = sys.env.getOrElse("SPARK_GRAFT_LAYOUT", "flat")
    layout match {
      case "lang" =>
        cloned.write.mode("overwrite").partitionBy("lang")
          .parquet(s"$dir/documents.parquet")
        // the point of the layout: a lang-scoped job must touch ONE
        // partition's files, enforced as a PartitionFilters entry on the
        // scan (not a post-scan row filter)
        val p = spark.read.parquet(s"$dir/documents.parquet")
          .filter(col("lang") === "en")
          .queryExecution.executedPlan.toString
        require(p.contains("PartitionFilters: [isnotnull(lang"),
          s"lang filter did not prune the partitioned layout:\n$p")
      case "flat" =>
        cloned.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      case other => sys.error(s"SPARK_GRAFT_LAYOUT must be flat|lang, got $other")
    }
    // clone embeddings only when a probed key reads them — doc-only
    // probes (the l17/l20/l21/l4/l22 series) skip the vector clone cost
    val embKeys = Set("l2_sim_embedding_nn", "l3_ann_ivf_topk",
      "l12_dedup_embedding", "j3_sim_cosine_pairs", "j4_sim_knn_query",
      "j10_multimodal_join")
    if (keys.exists(embKeys)) {
      val embs = spark.read.parquet(s"$src/embeddings.parquet")
      val m = embs.agg(max("vec_id")).head().getLong(0) + 1
      embs.crossJoin(spark.range(factor.toLong).select(col("id").as("clone")))
        .select((col("vec_id") + col("clone") * m).as("vec_id"),
          col("embedding"), col("label"))
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    }
    val rows = spark.read.parquet(s"$dir/documents.parquet").count()

    // min-of-2: this VM's 30-60 s host stalls would otherwise corrupt the
    // scaling-exponent read (same rule as Bench)
    val times = keys.map { k =>
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(k)(spark, dir).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      k -> ts.min
    }
    val qs = times.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    println(s"""{"factor":$factor,"layout":"$layout","rows":$rows,"queries":$qs}""")
    spark.stop()
  }
}

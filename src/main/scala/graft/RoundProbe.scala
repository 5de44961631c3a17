package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Closure-round diagnostic (r22): `runMain graft.RoundProbe [factor]`
  * counts the plain min-label closure's propagation rounds on l1's
  * actual dup graph (optionally on a factor-× near-dup clone, the
  * ScaleSmoke shape) next to the pointer-doubling variant's round count
  * on the same edges, plus edge/component-size observables. This is the
  * probe behind the r22 l1 closure switch: JobCount showed l1 at 98
  * jobs vs j2's 22 under the same kernel, and the cause was the
  * chain-shaped Hamming-≤3 simhash graph — measured 13/15/26 plain
  * rounds at 1×/8×/32× (a 30-round fail-loud cap) vs 8/12/10
  * pointer-doubling rounds. Evidence in OPTIMIZATION_r22.md. */
object RoundProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.local.dir", "/dev/shm/graft_spark")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def probe(name: String, edges: org.apache.spark.sql.DataFrame): Unit = {
      val e = edges.localCheckpoint()
      val nEdges = e.count()
      // plain closure, inlined with a round counter (logic identical to
      // LlmOps.minLabelClosure incl. the r22 round-1 specialization)
      var labels = e.groupBy(col("a_id").as("doc_id"))
        .agg(min(col("b_id")).as("nbr_min"))
        .select(col("doc_id"), least(col("doc_id"), col("nbr_min")).as("cluster_id"))
        .localCheckpoint(eager = false)
      var changed = 1L
      var rounds = 1
      while (changed > 0 && rounds < 60) {
        val nbrMin = e.join(labels, e("b_id") === labels("doc_id"))
          .groupBy(e("a_id").as("doc_id")).agg(min(col("cluster_id")).as("nbr_min"))
        val step = labels.join(nbrMin, Seq("doc_id"), "left")
          .select(col("doc_id"), col("cluster_id").as("old_id"),
            least(col("cluster_id"), coalesce(col("nbr_min"), col("cluster_id")))
              .as("cluster_id"))
          .localCheckpoint(eager = false)
        changed = step.filter(col("cluster_id") < col("old_id")).count()
        labels = step.select("doc_id", "cluster_id")
        rounds += 1
      }
      val (_, logRounds) = operators.LlmOps.minLabelClosureLog(
        labels.select("doc_id"), e)
      val comp = labels.groupBy("cluster_id").agg(count(lit(1)).as("sz"))
        .agg(count(lit(1)).as("n_comp"), max(col("sz")).as("max_sz")).collect()(0)
      println(s"PROBE $name edges=$nEdges plain_rounds=$rounds " +
        s"log_rounds=$logRounds n_comp=${comp.getLong(0)} max_comp=${comp.getLong(1)}")
    }

    // factor-x clone of documents (ScaleSmoke's near-dup clone shape,
    // documents-only — l1 reads nothing else)
    val factor = args.headOption.map(_.toInt).getOrElse(1)
    val dd = if (factor == 1) d else {
      val docs = spark.read.parquet(s"$d/documents.parquet")
      val n = docs.count()
      val cloneTok = expr(
        """concat(' q', chr(ascii('a') + clone % 26),
             ' q', chr(ascii('a') + (clone div 26) % 26),
             ' q', chr(ascii('a') + (clone div 676) % 26))""")
      val dir = Tables.scratch(spark, d, s"round_probe_x$factor")
      docs.crossJoin(spark.range(factor.toLong).select(col("id").as("clone")))
        .select((col("doc_id") + col("clone") * n).as("doc_id"),
          concat(col("text"), cloneTok).as("text"),
          col("lang"), col("source"), col("n_chars"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      dir
    }
    val sigs = operators.TrainOps.simhashed(spark, dd).localCheckpoint(eager = false)
    probe(s"l1_x$factor", operators.TrainOps.simhashBandPairsRaw(sigs))
    spark.stop()
  }
}

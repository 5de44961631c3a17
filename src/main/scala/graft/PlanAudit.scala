package graft

import org.apache.spark.sql.SparkSession

/** Physical-plan inspector: `runMain graft.PlanAudit <sfDir> <key>...`
  * prints the formatted plan of each named `SparkEntry.queries` entry —
  * the tool behind the "explain until it's the plan you'd want" loop
  * (pushdown reaching the scan, broadcast vs shuffle joins, codegen
  * spans, no stray Exchanges). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, keys @ _*) = args
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (keys.nonEmpty) keys else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { k =>
      println(s"==== $k ====")
      try println(SparkEntry.queries(k)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      catch { case e: Throwable => println(s"(failed: ${e.getMessage})") }
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Plan-dump helper for the l1 signature-stage subtree (the
  * aggregation [[operators.TrainOps.simhashVotes]] feeds l1): prints the
  * formatted plan of the signature frame alone, which the full key's
  * explain hides behind a localCheckpoint scan. */
object SigPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(operators.TrainOps.simhashed(spark, sfDir).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query (d1 pricing summary) on /root/testdata/sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    queries("d1_agg_groupby_pricing")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Aggregates.queries ++ Windows.queries ++
      Functions.queries ++ LlmOps.queries ++ Extensions.queries ++
      Streaming.queries ++ TrainOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ Aggregates.oracle ++ Windows.oracle ++
      Functions.oracle ++ LlmOps.oracle ++ Extensions.oracle ++
      Streaming.oracle ++ TrainOps.oracle
}

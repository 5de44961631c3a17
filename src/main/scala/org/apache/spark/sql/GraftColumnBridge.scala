package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column ⇄ Expression converters.
  *
  * Spark 4's public `Column` wraps a `ColumnNode` rather than a catalyst
  * `Expression`; the conversion lives in `classic.ExpressionUtils`, which is
  * `private[sql]`. This one-file shim (in the `org.apache.spark.sql`
  * package, the standard pattern for first-party extensions) re-exports the
  * two converters so graft's native codegen expressions (e.g.
  * `graft.functions.FloatDotProduct`) can be used as Columns.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Wrap a (resolved) logical plan as a DataFrame — `Dataset.ofRows` is
    * `private[sql]`; graft's custom operators (e.g. the native as-of join
    * plan in `graft.plans`) need it to re-enter the public API. */
  def dataFrame(spark: SparkSession, plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Register a graft expression under a SQL-callable name (idempotent).
    * Goes through the session FunctionRegistry, so the function is usable
    * from `spark.sql(...)` text exactly like a built-in — no UDF wrapper,
    * full codegen. */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}

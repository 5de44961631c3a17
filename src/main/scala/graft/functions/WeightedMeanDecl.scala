package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Add, AttributeReference, Cast, Divide, Expression, Literal, Multiply}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType, DoubleType}

/** Native declarative aggregate: weighted mean of `price` by `qty`,
  * accumulated in exact decimals (partial-merge order cannot change the
  * result) and evaluated as `double(wsum) / double(qsum)` — bit-identical
  * to the SQL oracle's `SUM(DECIMAL)/SUM(DECIMAL)` form and to the
  * `Aggregator`-based k2.
  *
  * A `DeclarativeAggregate` is pure expressions (init/update/merge/eval),
  * so it runs inside whole-stage codegen with map-side partial
  * aggregation — the production rung between built-ins and the
  * JVM-object `Aggregator` (which pays serialization per row-group). */
case class WeightedMeanDecl(price: Expression, qty: Expression)
    extends DeclarativeAggregate {

  private val decT = DecimalType(38, 6)

  private lazy val wsum = AttributeReference("wsum", decT)()
  private lazy val qsum = AttributeReference("qsum", decT)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(wsum, qsum)

  override lazy val initialValues: Seq[Expression] = Seq(
    Literal(Decimal(0, 38, 6), decT), Literal(Decimal(0, 38, 6), decT))

  private def c(e: Expression, t: DataType): Expression = Cast(e, t, None)

  override lazy val updateExpressions: Seq[Expression] = Seq(
    Add(wsum, c(Multiply(c(price, DecimalType(18, 2)), c(qty, DecimalType(18, 2))), decT)),
    Add(qsum, c(qty, decT)))

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    Add(wsum.left, wsum.right), Add(qsum.left, qsum.right))

  override lazy val evaluateExpression: Expression =
    Divide(c(wsum, DoubleType), c(qsum, DoubleType))

  override def children: Seq[Expression] = Seq(price, qty)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): WeightedMeanDecl =
    copy(price = newChildren(0), qty = newChildren(1))
}

object WeightedMeanDecl {
  /** weighted-mean aggregate Column over (price, qty). */
  def weightedMean(price: Column, qty: Column): Column =
    GraftColumnBridge.column(
      WeightedMeanDecl(GraftColumnBridge.expression(price),
        GraftColumnBridge.expression(qty)).toAggregateExpression())
}

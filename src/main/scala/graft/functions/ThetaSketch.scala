package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Union}
import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** THETA sketch aggregation + set algebra (SURVEY §2 d28) — the SET-OPERATION
  * member of the sketch-artifact ladder. HLL (d4/d21) answers only UNION
  * cardinality: two HLLs can be merged but never intersected, so "distinct
  * users who did BOTH click AND purchase" forces either an exact distinct
  * join or a different sketch. The DataSketches THETA sketch [Dasgupta et
  * al., "Theta-Sketch Framework", 2016; datasketches.apache.org — the
  * library Spark itself bundles for its hll_sketch_agg/kll functions] keeps
  * a bounded sample of the hashed key space below a threshold θ, which makes
  * INTERSECTION and DIFFERENCE well-defined on the sketches themselves —
  * set algebra on kilobyte artifacts, never on row data.
  *
  * [[ThetaSketchAgg]] is a native [[TypedImperativeAggregate]] — the same
  * base class and lifecycle as Spark's own `HllSketchAgg` (buffer = a live
  * theta `Union`, updated per row in the partial stage, serialized compact
  * only at shuffle boundaries, merged associatively) — so per-partition
  * partials combine map-side and one bounded sketch per partition crosses
  * the wire, the d21/d26 lake economics. The scalar estimators
  * ([[ThetaEstimate]], [[ThetaIntersectionEstimate]],
  * [[ThetaDifferenceEstimate]]) are eval-only (CodegenFallback): they run on
  * the ≤ |group| sketch rows AFTER aggregation, never in the row-stream hot
  * path.
  *
  * EXACT-UNDER-CAPACITY (the d16/d17 oracle precedent): a theta sketch
  * stays in exact mode (θ = 1, every distinct hash retained) while its
  * distinct count is below the nominal-entries capacity; union/intersection/
  * difference of exact sketches are exact, and the estimate is an integer
  * count. At lgK = 16 (65 536 nominal) the events user domain (≤ ~15 k at
  * sf0.1) is far under capacity at every tier, so d28 is hash-oracled
  * against exact COUNT DISTINCT SQL; the genuinely-approximate regime is
  * the production knob (size lgK to the memory/error budget), pinned by
  * ApproxSpec on an over-capacity fixture.
  */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def prettyName: String = "graft_theta_sketch_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case LongType => buffer.update(v.asInstanceOf[Long])
      case IntegerType => buffer.update(v.asInstanceOf[Int].toLong)
      case StringType => buffer.update(v.toString)
      case dt => throw new UnsupportedOperationException(
        s"theta_sketch_agg: unsupported input type ${dt.simpleString}")
    }
    buffer
  }

  override def merge(buffer: Union, input: Union): Union = {
    buffer.union(input.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(CompactSketch.wrap(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaSketchAgg =
    copy(child = newChild)
}

/** Rounded cardinality estimate of a serialized theta sketch. Integer-exact
  * in the under-capacity regime (θ = 1 ⇒ estimate = retained count). */
case class ThetaEstimate(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "graft_theta_estimate"
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    Math.round(CompactSketch.wrap(
      Memory.wrap(input.asInstanceOf[Array[Byte]])).getEstimate)
  override protected def withNewChildInternal(newChild: Expression): ThetaEstimate =
    copy(child = newChild)
}

/** Rounded |A ∩ B| estimate of two serialized theta sketches — the
  * operation HLL structurally cannot provide. */
case class ThetaIntersectionEstimate(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "graft_theta_intersection_estimate"
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val sa = CompactSketch.wrap(Memory.wrap(a.asInstanceOf[Array[Byte]]))
    val sb = CompactSketch.wrap(Memory.wrap(b.asInstanceOf[Array[Byte]]))
    Math.round(SetOperation.builder().buildIntersection()
      .intersect(sa, sb).getEstimate)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaIntersectionEstimate =
    copy(left = newLeft, right = newRight)
}

/** Rounded |A ∖ B| estimate of two serialized theta sketches. */
case class ThetaDifferenceEstimate(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "graft_theta_difference_estimate"
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val sa = CompactSketch.wrap(Memory.wrap(a.asInstanceOf[Array[Byte]]))
    val sb = CompactSketch.wrap(Memory.wrap(b.asInstanceOf[Array[Byte]]))
    Math.round(SetOperation.builder().buildANotB()
      .aNotB(sa, sb).getEstimate)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaDifferenceEstimate =
    copy(left = newLeft, right = newRight)
}

object ThetaSketch {
  import GraftColumnBridge.{column, expression}

  /** Build a theta sketch of `c`'s distinct values (lgK = log2 nominal
    * entries — exact below that capacity, bounded-error above). */
  def thetaSketchAgg(c: Column, lgK: Int = 16): Column =
    column(ThetaSketchAgg(expression(c), lgK).toAggregateExpression())

  def thetaEstimate(c: Column): Column = column(ThetaEstimate(expression(c)))

  def thetaIntersectionEstimate(a: Column, b: Column): Column =
    column(ThetaIntersectionEstimate(expression(a), expression(b)))

  def thetaDifferenceEstimate(a: Column, b: Column): Column =
    column(ThetaDifferenceEstimate(expression(a), expression(b)))

  /** Serialized EMPTY compact sketch — the identity of theta set algebra
    * (estimate 0; A∩∅ = ∅, A∖∅ = A). Callers coalesce absent groups to
    * this so a missing slice degrades to exact zeros instead of NULL
    * poisoning every estimator (the d28 pivot hazard). */
  def emptyThetaSketchBytes(lgK: Int = 16): Array[Byte] =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
      .getResult.toByteArray
}

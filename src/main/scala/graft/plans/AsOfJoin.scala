package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** A native as-of join operator — the full custom-operator rung of the
  * extension ladder (logical node → planner strategy → physical exec),
  * complementing the composed union+carry-forward formulation (c10).
  *
  * Semantics: for every left row, attach the LAST right row (in
  * `(key, time, tie)` ascending order) with the same key and
  * `rightTime <= leftTime`; nulls if none — i.e. a left-outer as-of join
  * with inclusive matching and max-(time, tie) tie-breaking, exactly c10's
  * semantics.
  *
  * Scale design: the exec DECLARES `ClusteredDistribution(key)` and
  * per-partition `(key, time)` ordering for both children and lets
  * Spark's `EnsureRequirements` insert the minimal exchanges/sorts — the
  * operator itself is a zero-allocation streaming merge over co-partitioned
  * sorted runs (one carried right row of state), never materializing the
  * per-key cross product that a join+filter+window formulation builds.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, leftTime: Attribute,
    rightKey: Attribute, rightTime: Attribute, rightTie: Attribute)
  extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule for the custom operator: the as-of join emits exactly
  * one output row per left row, so a `LocalLimit` above it can run below
  * it on the left side — at scale that turns "join everything, keep n"
  * into "read n left rows, join n". Registered alongside the strategy via
  * `spark.experimental.extraOptimizations`. */
object PushLimitThroughAsOfJoin extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.LocalLimit
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case ll @ LocalLimit(_, j: AsOfJoinPlan) if !j.left.isInstanceOf[LocalLimit] =>
      ll.copy(child = j.copy(left = LocalLimit(ll.limitExpr, j.left)))
  }
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, lt, rk, rt, tie) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt, tie) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, leftTime: Attribute,
    rightKey: Attribute, rightTime: Attribute, rightTie: Attribute)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTie, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    // long-backed key/time columns (bigint keys, timestamps-as-micros)
    val lKeyIdx = left.output.indexWhere(_.exprId == leftKey.exprId)
    val lTimeIdx = left.output.indexWhere(_.exprId == leftTime.exprId)
    val rKeyIdx = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rTimeIdx = right.output.indexWhere(_.exprId == rightTime.exprId)
    require(lKeyIdx >= 0 && lTimeIdx >= 0 && rKeyIdx >= 0 && rTimeIdx >= 0,
      "as-of join columns must come from the respective child outputs")
    val nRight = right.output.size
    left.execute().zipPartitions(right.execute()) { (lit, rit) =>
      val nullRight = new GenericInternalRow(nRight)
      val joined = new JoinedRow
      // downstream exchanges/sorts expect UnsafeRow
      val resultProj = UnsafeProjection.create(output, output)
      // loop-invariant error labels, hoisted: interpolating them per call
      // would allocate per-row garbage in the merge's hot loop
      val lKeyWhat = s"left key '${leftKey.name}'"
      val lTimeWhat = s"left time '${leftTime.name}'"
      val rKeyWhat = s"right key '${rightKey.name}'"
      val rTimeWhat = s"right time '${rightTime.name}'"
      def nonNull(r: InternalRow, idx: Int, what: String): Long = {
        // getLong on a null slot reads the raw word (0L) on UnsafeRow and
        // would silently match a real key 0 — fail loudly instead
        if (r.isNullAt(idx)) throw new IllegalStateException(
          s"as-of join $what is NULL; filter nulls out before joining")
        r.getLong(idx)
      }
      val it = new Iterator[InternalRow] {
        private var carried: InternalRow = _  // last right row <= current left time
        private var carriedKey = 0L
        private var pending: InternalRow = _  // head of the right iterator
        private def advanceRight(): Unit =
          pending = if (rit.hasNext) rit.next() else null
        advanceRight()
        override def hasNext: Boolean = lit.hasNext
        override def next(): InternalRow = {
          val l = lit.next()
          val k = nonNull(l, lKeyIdx, lKeyWhat)
          val t = nonNull(l, lTimeIdx, lTimeWhat)
          // consume right rows with key < k, or (key == k, time <= t);
          // the LAST one consumed for key k is the as-of match (inputs are
          // sorted by (key, time, tie), so later == larger (time, tie))
          while (pending != null && {
            val rk = nonNull(pending, rKeyIdx, rKeyWhat)
            rk < k || (rk == k && nonNull(pending, rTimeIdx, rTimeWhat) <= t)
          }) {
            if (pending.getLong(rKeyIdx) == k) {
              carried = pending.copy() // pending may be a reused UnsafeRow
              carriedKey = k
            }
            advanceRight()
          }
          if (carried != null && carriedKey == k) joined(l, carried)
          else joined(l, nullRight)
        }
      }
      it.map(resultProj)
    }
  }
}

object AsOfJoin {
  /** Left-outer as-of join of `leftDf` to `rightDf`: for each left row,
    * the last right row with equal `key` and `rightTime <= leftTime`
    * (ties on time broken by max `rightTie`). Column names must be
    * distinct across the two sides — on a self join (both sides sharing
    * exprIds) the right side's columns are automatically renamed with an
    * `__asof_r` suffix to preserve that. Key/time/tie columns must be
    * long-backed (bigint / timestamp) and NON-NULL — rows with a NULL
    * key or time fail the query at execution time (consistent with
    * pandas `merge_asof`, which raises on null merge keys) rather than
    * silently sorting nulls first. */
  def asOf(spark: SparkSession, leftDf: DataFrame, rightDf: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String, rightTie: String): DataFrame = {
    // runtime-injected strategy + optimizer rule: works in ANY session,
    // no extensions conf needed
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        AsOfJoinStrategy +: spark.experimental.extraStrategies
    if (!spark.experimental.extraOptimizations.contains(PushLimitThroughAsOfJoin))
      spark.experimental.extraOptimizations =
        PushLimitThroughAsOfJoin +: spark.experimental.extraOptimizations
    val lp = leftDf.queryExecution.analyzed
    // a self as-of join (same DataFrame on both sides) would carry the same
    // exprIds on both sides, making the exprId-based column binding in
    // doExecute ambiguous — re-alias the right side with fresh exprIds AND
    // fresh names ("<col>__asof_r"). The names must change: a same-name
    // re-alias (`a AS a`) is stripped by RemoveRedundantAliases, whose
    // duplicate-exprId exclusion only protects real Join nodes, not custom
    // BinaryNodes — the stripped plan would bind right columns to the left
    // row and silently mirror left values. Renaming also keeps the
    // distinct-names contract above: self-join outputs carry the suffix.
    val rp0 = rightDf.queryExecution.analyzed
    val selfJoin =
      lp.output.map(_.exprId).toSet.intersect(rp0.output.map(_.exprId).toSet).nonEmpty
    val rSuffix = if (selfJoin) "__asof_r" else ""
    val rp =
      if (!selfJoin) rp0
      else rightDf.select(rightDf.columns.toIndexedSeq.map(c =>
        rightDf.col(c).as(c + rSuffix)): _*).queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column $n in ${p.output.map(_.name)}"))
    // the exec reads key/time/tie via getLong: only long-backed types are
    // sound (Timestamp[NTZ]Type are micros-backed; DateType is int-backed
    // and would read garbage words from UnsafeRow)
    def longBacked(a: Attribute, role: String): Attribute = a.dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType => a
      case dt => throw new IllegalArgumentException(
        s"as-of join $role column '${a.name}' must be BIGINT or TIMESTAMP, got $dt")
    }
    GraftColumnBridge.dataFrame(spark,
      AsOfJoinPlan(lp, rp,
        longBacked(attr(lp, leftKey), "left key"),
        longBacked(attr(lp, leftTime), "left time"),
        longBacked(attr(rp, rightKey + rSuffix), "right key"),
        longBacked(attr(rp, rightTime + rSuffix), "right time"),
        longBacked(attr(rp, rightTie + rSuffix), "right tie-break")))
  }
}

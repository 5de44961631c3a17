package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.{Expression => CExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.functions._

/** `MERGE INTO` as SQL TEXT — the j18 entry point: parse a real MERGE
  * statement with Spark's OWN parser (`sessionState.sqlParser.parsePlan`
  * → [[MergeIntoTable]]) and lower the parsed plan to the
  * full-outer-join + CASE form over the registered temp views, returning
  * the POST-MERGE TABLE STATE as a DataFrame.
  *
  * Why lower instead of executing: Spark only *executes* MERGE against a
  * DSv2 table that implements row-level operations (a lakehouse format's
  * job); over parquet/temp-view relations the analyzer rejects it. But
  * the MERGE *language* is engine-neutral, and its canonical compilation
  * — the one Delta/Iceberg engines emit — is exactly one full-outer join
  * on the merge condition plus per-column CASE trees. This object IS that
  * compilation, built from the parser's plan so the SQL text is the
  * single source of truth (aliases, action order, action conditions,
  * star-expansion, BY SOURCE clauses all come from the statement).
  *
  * Semantics implemented (the SQL-standard / Delta contract):
  *  - matched (target ∧ source): first matched-action whose condition
  *    holds fires — UPDATE SET rewrites assigned columns, DELETE drops
  *    the row; no action fires → the target row survives unchanged.
  *  - not matched (source only): first insert-action whose condition
  *    holds inserts; columns a MERGE INSERT leaves unassigned are NULL;
  *    no action fires → the source row is ignored.
  *  - not matched BY SOURCE (target only): UPDATE/DELETE over target
  *    columns alone; no action fires → the target row survives.
  *  - CARDINALITY GUARD: a target row matching >1 source row makes
  *    UPDATE/DELETE ambiguous — the standard requires an error. Enforced
  *    IN-PLAN via a one-row broadcast guard frame (count of ambiguous
  *    target ids, `raise_error` when > 0) cross-joined onto the result —
  *    the repo's established fail-loud stat-frame idiom. The detection
  *    pass re-evaluates the matched subset of the join (the same price
  *    Delta's two-phase merge pays for the identical check); a window
  *    over the target row id would avoid the re-evaluation but sends
  *    every source-only row (null id) to ONE partition — the skew
  *    hazard outweighs the recompute.
  *
  * Scale: the lowering adds nothing to the join the merge needs anyway —
  * an equi-condition plans as one hash shuffle per side (base/delta
  * compacted on the same key upstream reuse their exchanges, see j16),
  * and the CASE trees are per-row expressions fused into the join's
  * output projection.
  */
object MergeSql {

  /** Marker/bookkeeping column names — underscore-unique so they can
    * never collide with user columns; dropped from the final result. */
  private val TPresent = "__graft_t_present"
  private val SPresent = "__graft_s_present"
  private val TId = "__graft_t_id"

  def mergeResult(spark: SparkSession, mergeSql: String): DataFrame = {
    val m = spark.sessionState.sqlParser.parsePlan(mergeSql) match {
      case m: MergeIntoTable => m
      case other => sys.error(
        s"MergeSql expects a MERGE INTO statement, got ${other.getClass.getSimpleName}")
    }
    val (tName, tAlias) = viewAndAlias(m.targetTable)
    val (sName, sAlias) = viewAndAlias(m.sourceTable)
    val tCols = spark.table(tName).columns.toSeq
    val sCols = spark.table(sName).columns.toSeq
    val target = spark.table(tName)
      .withColumn(TPresent, lit(true))
      .withColumn(TId, monotonically_increasing_id())
      .as(tAlias)
    val source = spark.table(sName)
      .withColumn(SPresent, lit(true))
      .as(sAlias)

    val joined = target.join(source, toCol(m.mergeCondition), "full_outer")
    val tPresent = col(TPresent) <=> lit(true)
    val sPresent = col(SPresent) <=> lit(true)
    val matched = tPresent && sPresent

    // branch arms: (fire-condition, per-column value, row survives?)
    def arms(actions: Seq[MergeAction], star: Seq[(String, Column)])
        : Seq[(Column, Map[String, Column], Boolean)] =
      actions.map {
        case u: UpdateAction =>
          (u.condition.map(toCol).getOrElse(lit(true)), assignMap(u.assignments), true)
        case u: UpdateStarAction =>
          // UPDATE SET * : every target column ← the same-named source
          // column — the star expands the assignments, NOT the condition
          (u.condition.map(toCol).getOrElse(lit(true)), star.toMap, true)
        case i: InsertAction =>
          (i.condition.map(toCol).getOrElse(lit(true)), assignMap(i.assignments), true)
        case i: InsertStarAction =>
          (i.condition.map(toCol).getOrElse(lit(true)), star.toMap, true)
        case dAct: DeleteAction =>
          (dAct.condition.map(toCol).getOrElse(lit(true)), Map.empty[String, Column], false)
        case other => sys.error(s"unsupported MERGE action: $other")
      }
    // star-expansion: positional for INSERT * (source columns in order),
    // by-name for UPDATE SET * (the SQL-standard star contract)
    val starByName = tCols.map(c => c -> col(s"$sAlias.$c"))
    val starPositional = tCols.zip(sCols.map(c => col(s"$sAlias.$c")))
    val mArms = arms(m.matchedActions, starByName)
    val nArms = arms(m.notMatchedActions, starPositional)
    val nbsArms = arms(m.notMatchedBySourceActions, starByName)

    // one CASE tree per output column; the default arm keeps the target
    // row (matched / by-source) or drops the insert (source-only, NULL —
    // the row is filtered by `keep` anyway)
    def valueOf(c: String): Column = {
      val keep = col(s"$tAlias.$c")
      def fold(as: Seq[(Column, Map[String, Column], Boolean)], dflt: Column) =
        as.foldRight(dflt) { case ((cond, assign, survives), els) =>
          val v = if (!survives) keep // deleted rows are filtered out below
            else assign.getOrElse(c, if (as eq nArms) lit(null) else keep)
          when(cond, v).otherwise(els)
        }
      when(matched, fold(mArms, keep))
        .when(sPresent, fold(nArms, lit(null)))
        .otherwise(fold(nbsArms, keep))
    }
    def survives: Column = {
      def fold(as: Seq[(Column, Map[String, Column], Boolean)], dflt: Column) =
        as.foldRight(dflt) { case ((cond, _, survives), els) =>
          when(cond, lit(survives)).otherwise(els)
        }
      when(matched, fold(mArms, lit(true)))
        .when(sPresent, fold(nArms, lit(false)))
        .otherwise(fold(nbsArms, lit(true)))
    }

    // cardinality guard: only target rows can be ambiguously matched, and
    // only when some matched-action would fire ambiguously. One-row
    // broadcast guard (count of multi-matched target ids → raise_error)
    // cross-joined onto every result row: skew-free (no null-id window
    // partition) at the documented price of re-evaluating the matched
    // subset — Delta's two-phase merge pays the same detection pass.
    val guarded =
      if (m.matchedActions.isEmpty) joined
      else {
        val nViol = joined.filter(matched)
          .groupBy(col(TId)).agg(count(lit(1)).as("__graft_c"))
          .filter(col("__graft_c") > 1L)
          .agg(count(lit(1)).as("__graft_n_viol"))
        val guard = nViol.select(
          when(col("__graft_n_viol") > 0L,
            raise_error(lit("MERGE cardinality violation: a target row " +
              "matches more than one source row")).cast("boolean"))
            .otherwise(lit(true)).as("__graft_ok"))
        joined.crossJoin(broadcast(guard))
      }

    // the guard column must flow into an expression the plan KEEPS —
    // folded into the keep-filter — or column pruning deletes the
    // raise_error before it can ever evaluate
    val keep =
      if (m.matchedActions.isEmpty) survives
      else survives && col("__graft_ok")
    guarded
      .withColumn("__graft_keep", keep)
      .select(col("__graft_keep") +: tCols.map(c => valueOf(c).as(c)): _*)
      .filter(col("__graft_keep"))
      .drop("__graft_keep")
  }

  /** Unresolved catalyst Expression → Column, via its SQL re-rendering —
    * keeps the lowering on the public DataFrame API (the parsed tree is
    * unresolved; `expr` re-parses it against the join's scope, where both
    * MERGE aliases are visible). */
  private def toCol(e: CExpression): Column = expr(e.sql)

  private def assignMap(as: Seq[Assignment]): Map[String, Column] =
    as.map { a =>
      // assignment keys are target columns, possibly alias-qualified;
      // normalize to the bare column name
      val name = a.key.sql.replace("`", "").split('.').last
      name -> toCol(a.value)
    }.toMap

  private def viewAndAlias(p: LogicalPlan): (String, String) = p match {
    case sa: SubqueryAlias => sa.child match {
      case u: UnresolvedRelation => (u.multipartIdentifier.mkString("."), sa.alias)
      case other => sys.error(s"unsupported MERGE relation: $other")
    }
    case u: UnresolvedRelation =>
      (u.multipartIdentifier.mkString("."), u.multipartIdentifier.last)
    case other => sys.error(s"unsupported MERGE relation: $other")
  }
}

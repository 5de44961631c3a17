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

  test("j18 MERGE-SQL post-merge state == j16's DataFrame merge") {
    // one statement, two compilations: the parsed-and-lowered MERGE must
    // produce exactly j16's full-outer-join upsert minus the audit column
    val viaSql = SparkEntry.queries("j18_merge_into_sql")(spark, sfTiny)
    val viaDf = SparkEntry.queries("j16_merge_upsert")(spark, sfTiny).drop("action")
    assert(viaSql.exceptAll(viaDf).count() == 0 &&
      viaDf.exceptAll(viaSql).count() == 0,
      "MERGE-SQL lowering diverged from the DataFrame merge")
  }

  test("MergeSql: DELETE / conditional / star / BY SOURCE actions on a planted fixture") {
    import spark.implicits._
    Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L))
      .toDF("k", "v").createOrReplaceTempView("ms_target")
    Seq((2L, -1L), (3L, 33L), (5L, 55L))
      .toDF("k", "v").createOrReplaceTempView("ms_source")
    val out = plans.MergeSql.mergeResult(spark,
      """MERGE INTO ms_target AS t USING ms_source AS s ON t.k = s.k
         WHEN MATCHED AND s.v < 0 THEN DELETE
         WHEN MATCHED THEN UPDATE SET v = s.v + 1
         WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v * 2)
         WHEN NOT MATCHED BY SOURCE AND t.k = 1 THEN DELETE
         WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = t.v + 100""")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // k=1: target-only, BY SOURCE DELETE → gone. k=2: matched, s.v<0 →
    // DELETE. k=3: matched → v=34. k=4: target-only → v=140. k=5:
    // source-only → INSERT v=110.
    assert(out == Map(3L -> 34L, 4L -> 140L, 5L -> 110L), s"got $out")
  }

  test("MergeSql: UPDATE SET * / INSERT * star expansion") {
    import spark.implicits._
    Seq((1L, 10L, "a"), (2L, 20L, "b"))
      .toDF("k", "v", "tag").createOrReplaceTempView("ms_star_t")
    Seq((2L, 22L, "B"), (9L, 99L, "Z"))
      .toDF("k", "v", "tag").createOrReplaceTempView("ms_star_s")
    val out = plans.MergeSql.mergeResult(spark,
      """MERGE INTO ms_star_t AS t USING ms_star_s AS s ON t.k = s.k
         WHEN MATCHED THEN UPDATE SET *
         WHEN NOT MATCHED THEN INSERT *""")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(out == Set((1L, 10L, "a"), (2L, 22L, "B"), (9L, 99L, "Z")), s"got $out")
  }

  test("DmlSql: UPDATE skips and DELETE keeps NULL-predicate rows (3VL), on a planted fixture") {
    import spark.implicits._
    // v: 1 → predicate TRUE, 0 → FALSE, null → NULL (the 3VL row)
    Seq((1L, Some(1L)), (2L, Some(0L)), (3L, None))
      .toDF("k", "v").createOrReplaceTempView("dml_t")
    val upd = plans.DmlSql.updateResult(spark,
      "UPDATE dml_t SET k = k + 100 WHERE v = 1")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(upd == Set((101L, 1L), (2L, 0L), (3L, -1L)),
      s"UPDATE must fire only on TRUE predicates, got $upd")
    val del = plans.DmlSql.deleteResult(spark,
      "DELETE FROM dml_t WHERE v = 1")
      .collect().map(_.getLong(0)).toSet
    // the NULL-predicate row SURVIVES — `NOT p` instead of `p IS NOT
    // TRUE` is exactly the hand-rolled rewrite bug this pins against
    assert(del == Set(2L, 3L),
      s"DELETE must keep FALSE and NULL predicates, got $del")
  }

  test("MergeSql: unassigned INSERT columns are NULL") {
    import spark.implicits._
    Seq((1L, 10L)).toDF("k", "v").createOrReplaceTempView("ms_null_t")
    Seq((7L, 70L)).toDF("k", "v").createOrReplaceTempView("ms_null_s")
    val out = plans.MergeSql.mergeResult(spark,
      """MERGE INTO ms_null_t AS t USING ms_null_s AS s ON t.k = s.k
         WHEN NOT MATCHED THEN INSERT (k) VALUES (s.k)""")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
    assert(out == Set((1L, Some(10L)), (7L, None)), s"got $out")
  }

  test("MergeSql: re-applying the same delta is idempotent") {
    // upsert MERGE is idempotent by construction (update rewrites to the
    // same values, insert keys now match and update instead) — the
    // property that makes at-least-once delivery into a MERGE loop safe
    import spark.implicits._
    Seq((1L, 10L), (2L, 20L)).toDF("k", "v").createOrReplaceTempView("ms_idem_t")
    Seq((2L, 22L), (3L, 33L)).toDF("k", "v").createOrReplaceTempView("ms_idem_s")
    def stmt(target: String) =
      s"""MERGE INTO $target AS t USING ms_idem_s AS s ON t.k = s.k
          WHEN MATCHED THEN UPDATE SET v = s.v
          WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)"""
    val once = plans.MergeSql.mergeResult(spark, stmt("ms_idem_t"))
    once.createOrReplaceTempView("ms_idem_t2")
    val twice = plans.MergeSql.mergeResult(spark, stmt("ms_idem_t2"))
    val a = once.collect().map(_.toSeq).toSet
    val b = twice.collect().map(_.toSeq).toSet
    assert(a == Set(Seq(1L, 10L), Seq(2L, 22L), Seq(3L, 33L)), s"got $a")
    assert(a == b, s"re-merge changed the table: $a vs $b")
  }

  test("MergeSql: cardinality violation (one target row, two source matches) raises") {
    import spark.implicits._
    Seq((1L, 10L)).toDF("k", "v").createOrReplaceTempView("ms_card_t")
    Seq((1L, 11L), (1L, 12L)).toDF("k", "v").createOrReplaceTempView("ms_card_s")
    val ex = intercept[Exception] {
      plans.MergeSql.mergeResult(spark,
        """MERGE INTO ms_card_t AS t USING ms_card_s AS s ON t.k = s.k
           WHEN MATCHED THEN UPDATE SET v = s.v""").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("MERGE cardinality violation")),
      s"expected the cardinality guard, got: ${ex.getMessage.take(300)}")
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

  test("a17 quarantine column carries the corrupt line VERBATIM") {
    // the quarantine pattern only works if the captured text is the raw
    // line (route it, re-parse it later, never lose it) — pin that, and
    // pin WHICH row-shapes land there: token-count violations AND
    // type-conversion failures both quarantine (the clean row does not)
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val dir = Tables.scratch(spark, "a17_fixture", "raw")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/rows.csv"),
      "1,A,1.5\n2,B\n3,C,2.5,EXTRA\nnotanumber,D,3.5\n")
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("s", StringType),
      StructField("v", DoubleType), StructField("_bad", StringType)))
    val pruneKey = "spark.sql.csv.parser.columnPruning.enabled"
    val prev = spark.conf.get(pruneKey)
    spark.conf.set(pruneKey, "false")
    try {
      val rows = spark.read.schema(schema)
        .option("mode", "PERMISSIVE").option("columnNameOfCorruptRecord", "_bad")
        .csv(s"$dir/rows.csv")
        .select("k", "_bad").collect()
        .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0)) -> r.getString(1))
        .toMap
      assert(rows(2L) == "2,B", "short row not captured verbatim")
      assert(rows(3L) == "3,C,2.5,EXTRA", "long row not captured verbatim")
      assert(rows(1L) == null, "clean row wrongly quarantined")
      assert(rows(-1L) == "notanumber,D,3.5",
        "type-conversion row not quarantined verbatim (key parses null)")
    } finally spark.conf.set(pruneKey, prev)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** Tolerance checks for the two justified-unoracled approximate operators
  * (SURVEY §2.D d4, §2.J j2 — j2 has its own spec). */
class ApproxSpec extends AnyFunSuite {
  import TestSpark._

  test("d4: HLL distinct counts within 5% of exact d3 per group") {
    val exact = SparkEntry.queries("d3_agg_count_distinct")(spark, sfTiny)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = SparkEntry.queries("d4_agg_approx_hll")(spark, sfTiny)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, ex) =>
      val ap = approx(k)
      assert(math.abs(ap - ex).toDouble / ex <= 0.05,
        s"group $k: approx=$ap exact=$ex off by more than 5%")
    }
  }

  test("d21: merged daily HLL sketches ≈ exact distinct AND == the direct sketch") {
    import org.apache.spark.sql.functions._
    val exact = graft.Tables.t(spark, sfTiny, "events")
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("ex"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val merged = SparkEntry.queries("d21_agg_hll_sketch_merge")(spark, sfTiny)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // tolerance: lgK=12 HLL is ~1.6% rse; 2% covers it at these counts
    assert(merged.keySet == exact.keySet)
    exact.foreach { case (k, ex) =>
      assert(math.abs(merged(k) - ex).toDouble / ex <= 0.02,
        s"$k: merged=${merged(k)} exact=$ex off by more than 2%")
    }
    // merge-consistency: unioning the daily sketches must estimate the
    // same as sketching all rows directly — the property that makes the
    // STORED per-day artifact trustworthy for later rollups
    val direct = graft.Tables.t(spark, sfTiny, "events")
      .groupBy("event_type")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id))").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.keySet.foreach { k =>
      assert(merged(k) == direct(k),
        s"$k: merged=${merged(k)} != direct=${direct(k)} — sketch merge drifted")
    }
  }

  test("d26: CMS bounds hold for every probe AND daily-merge == direct whole-table sketch") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.util.sketch.CountMinSketch
    val rows = SparkEntry.queries("d26_agg_cms_heavy_hitters")(spark, sfTiny).collect()
    assert(rows.length == 10, s"expected the 10 probe rows, got ${rows.length}")
    rows.foreach { r =>
      assert(r.getBoolean(3), s"user ${r.getLong(0)}: CMS undercounted " +
        s"(est=${r.getLong(2)} < exact=${r.getLong(1)}) — structurally impossible unless the " +
        "add/estimate hash paths diverged")
      assert(r.getBoolean(4), s"user ${r.getLong(0)}: est=${r.getLong(2)} " +
        s"exceeds exact+ε·N for exact=${r.getLong(1)}")
    }
    // merge-consistency, the d21 property for the frequency sketch: the
    // union of per-day sketches must estimate EXACTLY like one sketch
    // over all rows (CMS merge is counter-wise addition — bit-exact, not
    // approximate), so the stored per-day artifact is trustworthy
    val ev = graft.Tables.t(spark, sfTiny, "events")
    val direct = CountMinSketch.readFrom(
      ev.agg(expr("count_min_sketch(user_id, 0.001d, 0.99d, 42)").as("sk"))
        .head().getAs[Array[Byte]](0))
    rows.foreach { r =>
      assert(direct.estimateCount(r.getLong(0)) == r.getLong(2),
        s"user ${r.getLong(0)}: merged estimate ${r.getLong(2)} != " +
          s"direct ${direct.estimateCount(r.getLong(0))} — sketch merge drifted")
    }
  }

  test("d17: over-capacity sketch still finds the true heavy hitters (the regime the oracle can't see)") {
    // The oracled d17 runs UNDER capacity (31-token vocab ≤ 1000 tracked)
    // where DataSketches is exact; this covers the genuinely-approximate
    // production regime — distinct items ≫ capacity — where the sketch's
    // guarantee is "items with frequency > N/maxMapSize surface, with
    // bounded over-estimate". 3 planted heavy items among 2000 singleton
    // tails, capacity 64: the heavy trio must come back first, in order,
    // with estimates within the sketch's additive error (≈ N/capacity).
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val heavy = Seq.fill(1000)("alpha") ++ Seq.fill(800)("beta") ++ Seq.fill(600)("gamma")
    val tail = (0 until 2000).map(i => s"tail_$i")
    val n = heavy.size + tail.size
    val topk = (heavy ++ tail).toDF("t")
      .agg(expr("approx_top_k(t, 3, 64)").as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item"), col("e.count"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(topk.map(_._1).toSeq == Seq("alpha", "beta", "gamma"),
      s"heavy hitters missing or misordered: ${topk.mkString(",")}")
    val err = n / 64 + 1
    Seq(("alpha", 1000L), ("beta", 800L), ("gamma", 600L)).foreach { case (item, ex) =>
      val est = topk.toMap.apply(item)
      assert(est >= ex && est <= ex + err,
        s"$item: estimate $est outside [$ex, ${ex + err}]")
    }
  }

  test("d27: histogram quantiles within one bucket width of exact, AND daily-merge == direct histogram") {
    import org.apache.spark.sql.functions._
    val W = 1000.0
    val row = SparkEntry.queries("d27_agg_quantile_hist_merge")(spark, sfTiny).head()
    val est = Map(50 -> row.getDouble(0), 90 -> row.getDouble(1), 99 -> row.getDouble(2))
    // error bound BY CONSTRUCTION: the reported upper bucket edge can
    // overshoot the exact discrete quantile by at most one bucket width
    graft.Tables.t(spark, sfTiny, "orders")
      .createOrReplaceTempView("d27spec_orders")
    Seq(50, 90, 99).foreach { p =>
      val ex = spark.sql(
        s"SELECT percentile_disc(${p / 100.0}) WITHIN GROUP (ORDER BY o_totalprice) " +
          "FROM d27spec_orders").head().getDouble(0)
      assert(est(p) >= ex && est(p) <= ex + W,
        s"p$p: histogram estimate ${est(p)} outside [$ex, ${ex + W}]")
    }
    // merge-consistency (the d21/d26 property for the quantile sketch):
    // per-day partial histograms merged by counter addition must equal the
    // single-pass whole-table histogram bucket-for-bucket — here it is an
    // arithmetic identity (sum re-association), asserted to pin the
    // implementation to it
    val direct = graft.Tables.t(spark, sfTiny, "orders")
      .groupBy(floor(col("o_totalprice") / W).as("bkt"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mergedN = row.getLong(3)
    val nBuckets = row.getLong(4)
    assert(nBuckets == direct.size.toLong,
      s"merged histogram has $nBuckets buckets, direct has ${direct.size}")
    assert(mergedN == direct.values.sum,
      s"merged total $mergedN != direct total ${direct.values.sum}")
  }

  test("d16: approx quantiles within 1% of exact d11 per group") {
    def rows(key: String) = SparkEntry.queries(key)(spark, sfTiny)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val exact = rows("d11_agg_percentile")
    val approx = rows("d16_agg_approx_quantile")
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, (m, p)) =>
      val (am, ap) = approx(k)
      assert(math.abs(am - m) / m <= 0.01, s"$k median approx=$am exact=$m")
      assert(math.abs(ap - p) / p <= 0.01, s"$k p90 approx=$ap exact=$p")
    }
  }

  test("d28: theta set ops — exact under capacity, bounded + sane over capacity") {
    import org.apache.spark.sql.functions._
    import graft.functions.ThetaSketch._
    import spark.implicits._
    // UNDER capacity (the oracled regime, here asserted directly against
    // exact set algebra on a planted overlap): A = [0, 3000), B = [2000,
    // 5000) → |A∩B| = 1000, |A∖B| = 2000, |B∖A| = 2000, all exact at
    // lgK=16 because every sketch stays in exact mode (θ = 1)
    val ab = spark.range(5000).select(col("id"),
      (col("id") < 3000).as("in_a"), (col("id") >= 2000).as("in_b"))
    val row = ab.agg(
      thetaSketchAgg(when(col("in_a"), col("id"))).as("a"),
      thetaSketchAgg(when(col("in_b"), col("id"))).as("b"))
      .select(thetaEstimate(col("a")), thetaEstimate(col("b")),
        thetaIntersectionEstimate(col("a"), col("b")),
        thetaDifferenceEstimate(col("a"), col("b")),
        thetaDifferenceEstimate(col("b"), col("a")))
      .head()
    assert((0 until 5).map(row.getLong) == Seq(3000L, 3000L, 1000L, 2000L, 2000L),
      s"under-capacity theta set ops must be exact: $row")
    // OVER capacity (the production regime): 60k ∪-overlapping 100k at
    // lgK=9 (512 nominal) — estimates must land within the sketch's
    // documented relative standard error (~1/sqrt(512) ≈ 4.4%; allow 4
    // sigma) and the intersection estimate must stay inside the overlap's
    // error envelope rather than collapsing to 0 or the union size
    val big = spark.range(100000).select(col("id"),
      (col("id") < 60000).as("in_a"), (col("id") >= 40000).as("in_b"))
    val brow = big.agg(
      thetaSketchAgg(when(col("in_a"), col("id")), 9).as("a"),
      thetaSketchAgg(when(col("in_b"), col("id")), 9).as("b"))
      .select(thetaEstimate(col("a")),
        thetaIntersectionEstimate(col("a"), col("b")))
      .head()
    val (estA, estI) = (brow.getLong(0), brow.getLong(1))
    assert(math.abs(estA - 60000.0) / 60000.0 <= 0.18,
      s"over-capacity |A| estimate $estA outside 4-sigma of 60000")
    assert(math.abs(estI - 20000.0) / 20000.0 <= 0.35,
      s"over-capacity intersection estimate $estI outside the error envelope of 20000")
  }

  test("d28: the EMPTY sketch is the set-algebra identity (the pivot coalesce contract)") {
    import org.apache.spark.sql.functions._
    import graft.functions.ThetaSketch._
    // d28 coalesces an ABSENT pivot cell to emptyThetaSketchBytes so a
    // fixture lacking one event type degrades to exact zeros matching
    // the SQL oracle (r17 ADVICE). Pin the algebra that makes that
    // degradation correct: estimate(∅)=0, A∩∅=∅, A∖∅=A, ∅∖A=∅.
    val empty = lit(graft.functions.ThetaSketch.emptyThetaSketchBytes())
    val row = spark.range(1234)
      .agg(thetaSketchAgg(col("id")).as("a"))
      .select(
        thetaEstimate(empty),
        thetaIntersectionEstimate(col("a"), empty),
        thetaDifferenceEstimate(col("a"), empty),
        thetaDifferenceEstimate(empty, col("a")))
      .head()
    assert((0 until 4).map(row.getLong) == Seq(0L, 0L, 1234L, 0L),
      s"empty-sketch identity algebra violated: $row")
  }
}

package graft.operators

import graft.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.E window functions (ranking / analytic / frames).
  *
  * Scale notes: every window over a fact table partitions by a real key
  * (user_id, p_brand) so the WindowExec shuffles once on the partition key
  * and sorts within partitions — no global single-partition sort. The one
  * globally-ordered computation (e7) uses a distributed two-pass rank; its
  * only unpartitioned window runs over the ~32-row partition-count table. Timestamp outputs are emitted as epoch
  * microseconds BIGINT (unix_micros / DuckDB epoch_us) per §7.2, and
  * range frames are defined over epoch-µs longs so both engines use the
  * identical integer frame arithmetic.
  */
object Windows {

  private def events(s: org.apache.spark.sql.SparkSession, d: String) =
    t(s, d, "events")

  val queries: Map[String, Q] = Map(
    // top-3 events per user by value (tie -> event_id)
    "e1_win_topk_per_group" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("value").desc, col("event_id"))
      events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("user_id", "rn", "event_id", "value")
        .orderBy("user_id", "rn")
    }),

    "e2_win_rank_dense" -> ((s, d) => {
      val w = Window.partitionBy("p_brand").orderBy(col("p_retailprice").desc)
      t(s, d, "part")
        .select(col("p_partkey"), col("p_brand"), col("p_retailprice"),
          rank().over(w).as("rnk"), dense_rank().over(w).as("drnk"))
        .orderBy("p_brand", "rnk", "p_partkey")
    }),

    // per-user inter-event gap (µs) + next event_type
    "e3_win_lag_lead" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      events(s, d)
        .select(col("event_id"), col("user_id"), epochUs(col("ts")).as("ts_us"),
          (epochUs(col("ts")) - lag(epochUs(col("ts")), 1).over(w)).as("gap_us"),
          lead(col("event_type"), 1).over(w).as("next_type"))
        .orderBy("event_id")
    }),

    // 4-row moving average of value per user
    "e4_win_moving_avg_rows" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(-3, 0)
      events(s, d)
        .select(col("event_id"), col("user_id"),
          rnd4(avg(col("value")).over(w)).as("mavg"))
        .orderBy("event_id")
    }),

    // per-user sum of value over trailing 10 minutes (range frame on epoch-µs)
    "e5_win_range_frame" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts_us"))
        .rangeBetween(-600000000L, 0)
      events(s, d)
        .withColumn("ts_us", epochUs(col("ts")))
        .select(col("event_id"), col("user_id"),
          rnd4(sum(col("value")).over(w)).as("win_sum"))
        .orderBy("event_id")
    }),

    // running revenue per customer over order dates (rows frame, unique key)
    "e6_win_cumulative" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          dbl(sum(dec(col("o_totalprice"), 18, 2)).over(w)).as("running"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // ntile / percent_rank / cume_dist over customer acctbal (tie -> custkey).
    // Distributed two-pass global rank instead of an unpartitioned Window
    // (which would funnel the whole table through ONE task): range-partition
    // on the sort key, rank locally per partition, then offset each
    // partition's ranks by the cumulative counts of the partitions before
    // it. The only unpartitioned window left runs over the ~32-row
    // per-partition count table. The ordering key (c_acctbal, c_custkey)
    // is tie-free (custkey unique), so rank == row_number and the
    // distribution stats reduce to closed-form expressions of (rank, n).
    "e7_win_distribution" -> ((s, d) => {
      val parts = t(s, d, "customer")
        .select(col("c_custkey"), col("c_acctbal"))
        .repartitionByRange(32, col("c_acctbal"), col("c_custkey"))
        .withColumn("pid", spark_partition_id())
      val wLocal = Window.partitionBy("pid")
        .orderBy(col("c_acctbal"), col("c_custkey"))
      val local = parts.withColumn("lrn", row_number().over(wLocal).cast("long"))
      val offsets = local.groupBy("pid").agg(count(lit(1)).as("pn"))
        .withColumn("off", coalesce(
          sum(col("pn")).over(Window.orderBy("pid")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("pid", "off")
      val n = local.groupBy().agg(count(lit(1)).as("n"))
      val ranked = local
        .join(broadcast(offsets), "pid")
        .crossJoin(broadcast(n))
        .withColumn("rnk", col("off") + col("lrn"))
        // ntile(4): first (n % 4) buckets get ceil(n/4) rows, rest floor(n/4)
        .withColumn("q", expr("n div 4"))
        .withColumn("r", col("n") % 4)
      val quartile = when(col("rnk") <= (col("q") + 1) * col("r"),
          expr("(rnk - 1) div (q + 1) + 1"))
        .otherwise(expr("r + (rnk - (q + 1) * r - 1) div q + 1"))
      ranked.select(col("c_custkey"), col("c_acctbal"),
          quartile.cast("int").as("quartile"),
          rnd4((col("rnk") - 1).cast("double") / (col("n") - 1)).as("pr"),
          rnd4(col("rnk").cast("double") / col("n")).as("cd"))
        .orderBy("c_custkey")
    }),

    // first/last event_type per user by time (explicit full frame)
    "e8_win_first_last" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      events(s, d)
        .select(col("user_id"),
          first(col("event_type")).over(w).as("first_type"),
          last(col("event_type")).over(w).as("last_type"))
        .distinct()
        .orderBy("user_id")
    }),

    // 30-min-gap batch sessionization: gap flag -> running sum -> session id
    "e9_win_sessionize" -> ((s, d) => {
      val wOrd = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      events(s, d)
        .withColumn("prev_us", lag(epochUs(col("ts")), 1).over(wOrd))
        .withColumn("new_sess",
          when(col("prev_us").isNull ||
            epochUs(col("ts")) - col("prev_us") > 1800000000L, 1L).otherwise(0L))
        .withColumn("session_id", sum(col("new_sess")).over(
          wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          min(epochUs(col("ts"))).as("sess_start_us"),
          max(epochUs(col("ts"))).as("sess_end_us"))
        .orderBy("user_id", "session_id")
    }),

    // e10: time-series densification (resample + gap-fill) — per
    // event_type hourly counts over the GLOBAL [min, max] hour range
    // with every missing slot zero-filled; the transform that turns an
    // event log into a regular time series for reporting/feature tables.
    // The dense spine is types × hours from a 1-ROW broadcast bounds
    // frame (deliberate tiny nested-loop join, like e7/j4's scalar
    // broadcasts) + explode(sequence(...)); real data joins the spine
    // by (type, hour) — at scale the spine is negligible and the event
    // aggregation is the only data-sized shuffle.
    "e10_resample_gapfill" -> ((s, d) => {
      val ev = events(s, d).select(col("event_type"),
        (expr("unix_micros(ts) div 3600000000") * 3600000000L).as("hour_us"))
      val counts = ev.groupBy("event_type", "hour_us").agg(count(lit(1)).as("cnt"))
      val bounds = ev.agg(min(col("hour_us")).as("lo"), max(col("hour_us")).as("hi"))
      val spine = ev.select("event_type").distinct()
        .crossJoin(broadcast(bounds))
        .select(col("event_type"),
          explode(sequence(col("lo"), col("hi"), lit(3600000000L))).as("hour_us"))
      spine.join(counts, Seq("event_type", "hour_us"), "left")
        .select(col("event_type"), col("hour_us"),
          coalesce(col("cnt"), lit(0L)).as("cnt"))
        .orderBy("event_type", "hour_us")
    }),

    // e11: IGNORE NULLS analytics — FORWARD FILL (last-observation-
    // carried-forward), the time-series repair idiom: a sensor stream
    // with dropped readings (synthesized deterministically — every 5th
    // event's value nulled) repaired per user by `last(value) IGNORE
    // NULLS` over a trailing frame; plus `nth_value(value, 2)` over the
    // full frame (the "second reading per user" report column). Both
    // windows partition by user_id — one hash shuffle, per-user sort,
    // no global ordering anywhere.
    "e11_win_ignore_nulls" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val trail = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, d)
        .withColumn("gappy",
          when(col("event_id") % 5 === 0, lit(null)).otherwise(col("value")))
        .select(col("event_id"), col("user_id"),
          rnd4(col("gappy")).as("gappy"),
          rnd4(last(col("gappy"), ignoreNulls = true).over(trail)).as("filled"),
          rnd4(nth_value(col("value"), 2).over(full)).as("second_val"))
        .orderBy("event_id")
    }),

    // e12: LINEAR INTERPOLATION of interior gaps — the third member of
    // the gap-repair family (e10 zero-fills a regular grid, e11 carries
    // the LAST value forward; this reconstructs the straight line
    // between the surrounding observations — the sensor-data
    // convention, where a held-flat value fabricates a plateau). Per
    // user, event-time-weighted: prev/next non-null neighbor VALUE and
    // TIME come from last/first-IGNORE-NULLS over the trailing/leading
    // frames (two window calls per side, same null condition — no
    // struct-carry needed), then the interpolant is
    // prev + (next − prev)·(t − t_prev)/(t_next − t_prev). EDGE gaps
    // (no neighbor on one side) stay NULL — interpolation is an
    // interior-only contract, extrapolation is a different op. One
    // user_id shuffle serves all four window calls (same frame spec).
    // e13: TIME-WEIGHTED AVERAGE over an irregular series — the metric
    // a plain avg() silently gets wrong on unevenly-sampled data (a
    // value held for 6 hours must count 360× a value held for a minute;
    // sensor/price/gauge pipelines all need this form). Interval
    // convention: each sample is held until the user's NEXT sample
    // (lead), the final open-ended sample contributes no interval — no
    // day-boundary convention to disagree on. A same-ts pair (ordered by
    // event_id) yields a zero-width interval that correctly contributes
    // nothing. Exactness: value quantized to integer micro-units (the
    // l5/l21/j17 rule), weights are epoch-µs longs, and the Σ(uval·w)
    // accumulator runs in DECIMAL(38,0) — uval·w reaches ~8.6e19, past
    // Long range, so a bigint accumulator would silently wrap; the
    // decimal product is exact in both engines and only the final
    // division touches floating point (round 4, the j20 idiom). Scale:
    // one window + one groupBy over the SAME user_id key — Catalyst
    // plans a single hash exchange, and the window's lead(1) is a
    // bounded frame (no full-partition buffering).
    "e13_win_time_weighted_avg" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          floor(col("value") * 1e6 + 0.5).cast("long").as("uval"),
          epochUs(col("ts")).as("ts_us"))
        .withColumn("nxt", lead(col("ts_us"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_intervals"),
          sum(col("nxt") - col("ts_us")).as("total_w_us"),
          sum(dec(col("uval"), 20, 0) *
            dec(col("nxt") - col("ts_us"), 18, 0)).as("numer"))
        .select(col("user_id"), col("n_intervals"), col("total_w_us"),
          rnd4(dbl(col("numer")) / dbl(col("total_w_us")) / lit(1e6)).as("twap"))
        .orderBy("user_id")
    }),

    // e14: TEMPORAL CONVERSION FUNNEL — the product-analytics staple
    // (every events warehouse runs it daily): which users performed
    // view → click → purchase IN THAT ORDER, with each stage's event
    // STRICTLY AFTER the previous stage's first completion. Distinct
    // from l24's document filter funnel (set-membership per doc — no
    // ordering) and e9's sessionization (gap-based grouping): this is
    // ordered-subsequence matching, expressed RELATIONALLY as chained
    // conditional mins — stage n = min event time of type n among
    // events after the user's stage-(n−1) time — instead of per-user
    // array folds (the l49 lesson: Spark's in-row HOF lambdas are
    // interpreted; these three aggregations are codegen'd hash aggs).
    // min() makes every stage time deterministic under duplicate
    // timestamps, and each stage must land within a 1-DAY conversion
    // window of the previous stage's completion — the windowed-funnel
    // semantics every analytics product ships ("converted within 24h"),
    // and what makes the cut non-vacuous on this data (unwindowed,
    // every user completes all stages; windowed at sf0.01 the funnel
    // reads 150 → 60 → 25, probed across all tiers: 15→6→3 at
    // sf0.001, 1500→536→217 at sf0.1). Scale: three passes over
    // events, each a hash agg + join ON THE SAME user_id key —
    // Catalyst reuses one exchange layout, stage frames shrink
    // monotonically (funnel ⇒ each join's right side is smaller), and
    // the oracle needs no timestamps in the output (counts only), so
    // the µs-vs-ns encoding never touches the hash.
    "e14_funnel_stages" -> ((s, d) => {
      val ev = events(s, d)
      val day = expr("INTERVAL 1 DAY")
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("t1"))
      val c = ev.filter(col("event_type") === "click").join(v, "user_id")
        .filter(col("ts") > col("t1") && col("ts") <= col("t1") + day)
        .groupBy("user_id").agg(min(col("ts")).as("t2"))
      val p = ev.filter(col("event_type") === "purchase").join(c, "user_id")
        .filter(col("ts") > col("t2") && col("ts") <= col("t2") + day)
        .groupBy("user_id").agg(min(col("ts")).as("t3"))
      def leg(i: Int, name: String, df: org.apache.spark.sql.DataFrame) =
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(i.toLong).as("stage_id"), lit(name).as("stage"),
            col("n_users"))
      leg(1, "view", v)
        .unionAll(leg(2, "view_click", c))
        .unionAll(leg(3, "view_click_purchase", p))
        .orderBy("stage_id")
    }),

    "e12_win_interpolate" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val trail = w.rowsBetween(Window.unboundedPreceding, -1)
      val lead = w.rowsBetween(1, Window.unboundedFollowing)
      events(s, d)
        .withColumn("ts_us", epochUs(col("ts")))
        .withColumn("gappy",
          when(col("event_id") % 5 === 0, lit(null)).otherwise(col("value")))
        .withColumn("pv", last(col("gappy"), ignoreNulls = true).over(trail))
        .withColumn("pt", last(when(col("gappy").isNotNull, col("ts_us")),
          ignoreNulls = true).over(trail))
        .withColumn("nv", first(col("gappy"), ignoreNulls = true).over(lead))
        .withColumn("nt", first(when(col("gappy").isNotNull, col("ts_us")),
          ignoreNulls = true).over(lead))
        .select(col("event_id"), col("user_id"), rnd4(col("gappy")).as("gappy"),
          rnd4(when(col("gappy").isNotNull, col("gappy"))
            .otherwise(col("pv") + (col("nv") - col("pv")) *
              (col("ts_us") - col("pt")) / (col("nt") - col("pt"))))
            .as("filled"))
        .orderBy("event_id")
    })
  )

  val oracle: Map[String, String] = Map(
    // the same chained conditional mins + 1-day conversion windows;
    // counts only, so the ts encoding never reaches the hash
    "e14_funnel_stages" ->
      """WITH v AS (
           SELECT user_id, min(ts) AS t1 FROM events
           WHERE event_type = 'view' GROUP BY 1),
         c AS (
           SELECT e.user_id, min(ts) AS t2 FROM events e JOIN v USING (user_id)
           WHERE event_type = 'click' AND ts > t1
             AND ts <= t1 + INTERVAL 1 DAY GROUP BY 1),
         p AS (
           SELECT e.user_id, min(ts) AS t3 FROM events e JOIN c USING (user_id)
           WHERE event_type = 'purchase' AND ts > t2
             AND ts <= t2 + INTERVAL 1 DAY GROUP BY 1)
         SELECT CAST(1 AS BIGINT) AS stage_id, 'view' AS stage,
                (SELECT count(*) FROM v) AS n_users
         UNION ALL SELECT 2, 'view_click', (SELECT count(*) FROM c)
         UNION ALL SELECT 3, 'view_click_purchase', (SELECT count(*) FROM p)
         ORDER BY 1""",

    "e10_resample_gapfill" ->
      """WITH ev AS (
           SELECT event_type,
                  (epoch_us(ts) // 3600000000) * 3600000000 AS hour_us
           FROM events),
         counts AS (
           SELECT event_type, hour_us, count(*) AS cnt FROM ev GROUP BY 1, 2),
         bounds AS (SELECT min(hour_us) AS lo, max(hour_us) AS hi FROM ev),
         hours AS (
           SELECT unnest(generate_series(lo, hi, 3600000000)) AS hour_us
           FROM bounds),
         types AS (SELECT DISTINCT event_type FROM ev)
         SELECT t.event_type, h.hour_us, CAST(coalesce(c.cnt, 0) AS BIGINT) AS cnt
         FROM types t CROSS JOIN hours h
         LEFT JOIN counts c ON c.event_type = t.event_type AND c.hour_us = h.hour_us
         ORDER BY 1, 2""",

    "e1_win_topk_per_group" ->
      """SELECT user_id, rn, event_id, value FROM (
           SELECT user_id, event_id, value,
                  CAST(row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS INTEGER) AS rn
           FROM events) WHERE rn <= 3 ORDER BY user_id, rn""",

    "e2_win_rank_dense" ->
      """SELECT p_partkey, p_brand, p_retailprice,
           CAST(rank() OVER w AS INTEGER) AS rnk, CAST(dense_rank() OVER w AS INTEGER) AS drnk
         FROM part
         WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice DESC)
         ORDER BY p_brand, rnk, p_partkey""",

    "e3_win_lag_lead" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
           epoch_us(ts) - lag(epoch_us(ts), 1) OVER w AS gap_us,
           lead(event_type, 1) OVER w AS next_type
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         ORDER BY event_id""",

    "e4_win_moving_avg_rows" ->
      """SELECT event_id, user_id,
           round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS mavg
         FROM events ORDER BY event_id""",

    "e5_win_range_frame" ->
      """SELECT event_id, user_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW), 4) AS win_sum
         FROM events ORDER BY event_id""",

    "e6_win_cumulative" ->
      """SELECT o_custkey, o_orderkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running
         FROM orders ORDER BY o_custkey, o_orderkey""",

    "e7_win_distribution" ->
      """SELECT c_custkey, c_acctbal,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile,
           round(percent_rank() OVER w, 4) AS pr,
           round(cume_dist() OVER w, 4) AS cd
         FROM customer
         WINDOW w AS (ORDER BY c_acctbal, c_custkey)
         ORDER BY c_custkey""",

    "e8_win_first_last" ->
      """SELECT DISTINCT user_id,
           first_value(event_type) OVER w AS first_type,
           last_value(event_type) OVER w AS last_type
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         ORDER BY user_id""",

    "e9_win_sessionize" ->
      """WITH flagged AS (
           SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                  CASE WHEN lag(epoch_us(ts), 1) OVER w IS NULL
                         OR epoch_us(ts) - lag(epoch_us(ts), 1) OVER w > 1800000000
                       THEN 1 ELSE 0 END AS new_sess
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         ), sessioned AS (
           SELECT user_id, ts_us,
                  CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
           FROM flagged
         )
         SELECT user_id, session_id, count(*) AS n_events,
                min(ts_us) AS sess_start_us, max(ts_us) AS sess_end_us
         FROM sessioned GROUP BY user_id, session_id
         ORDER BY user_id, session_id""",

    // same IGNORE NULLS semantics in DuckDB; the first events of a user
    // may precede any observation — filled stays NULL there on both sides
    "e11_win_ignore_nulls" ->
      """SELECT event_id, user_id,
           round(CAST(gappy AS DOUBLE), 4) AS gappy,
           round(CAST(last_value(gappy IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 4) AS filled,
           round(CAST(nth_value(value, 2) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS DOUBLE), 4) AS second_val
         FROM (SELECT *, CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS gappy
               FROM events)
         ORDER BY event_id""",

    // same hold-until-next intervals; Σ(uval·w) in DECIMAL(38,0) (past
    // bigint range), only the final division is floating point
    "e13_win_time_weighted_avg" ->
      """WITH s AS (
           SELECT user_id, epoch_us(ts) AS ts_us,
                  CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS uval,
                  lead(epoch_us(ts)) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
           FROM events)
         SELECT user_id, count(*) AS n_intervals,
                CAST(sum(nxt - ts_us) AS BIGINT) AS total_w_us,
                round(CAST(sum(CAST(uval AS DECIMAL(20,0)) *
                               CAST(nxt - ts_us AS DECIMAL(18,0))) AS DOUBLE)
                      / CAST(sum(nxt - ts_us) AS DOUBLE) / 1e6, 4) AS twap
         FROM s WHERE nxt IS NOT NULL
         GROUP BY user_id ORDER BY user_id""",

    // identical prev/next-neighbor windows and interpolation arithmetic;
    // edges (no neighbor on one side) stay NULL on both engines
    "e12_win_interpolate" ->
      """WITH g AS (
           SELECT event_id, user_id, ts, epoch_us(ts) AS ts_us,
                  CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS gappy
           FROM events),
         nb AS (
           SELECT *,
             last_value(gappy IGNORE NULLS) OVER tr AS pv,
             last_value(CASE WHEN gappy IS NOT NULL THEN ts_us END IGNORE NULLS)
               OVER tr AS pt,
             first_value(gappy IGNORE NULLS) OVER ld AS nv,
             first_value(CASE WHEN gappy IS NOT NULL THEN ts_us END IGNORE NULLS)
               OVER ld AS nt
           FROM g
           WINDOW
             tr AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             ld AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
         SELECT event_id, user_id, round(CAST(gappy AS DOUBLE), 4) AS gappy,
           round(CAST(CASE WHEN gappy IS NOT NULL THEN gappy
                ELSE pv + (nv - pv) * (ts_us - pt) / (nt - pt) END
             AS DOUBLE), 4) AS filled
         FROM nb ORDER BY event_id"""
  )
}

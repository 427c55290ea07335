package graft.operators

import graft.QueryModule
import org.apache.spark.sql.functions._

/** SURVEY.md §2.3 L — time-series and behavioral analytics over `events`:
  * grid resampling with forward fill, ordered funnels, retention cohorts
  * (the standard sequence-feature / product-analytics operators).
  *
  * Determinism: the per-bucket mean uses the exact-decimal dsum→double→
  * portable-round pattern; funnel steps compare raw µs timestamps plus
  * exact INTERVAL arithmetic; week indices are integer arithmetic on
  * floored epoch seconds (DuckDB's EPOCH cast rounds where Spark floors,
  * so the oracle says FLOOR(EPOCH(ts)) explicitly).
  *
  * Scale notes: q_resample_ffill's grid is |users| × |hours| by
  * construction — a deliberate densification, so output size is the
  * operator's contract, not a blowup; the span aggregate is a 1-row
  * broadcast, the grid⋈bucket join shuffles both sides on the SAME
  * (user_id, hour) key, and the fill is one window scan whose per-user
  * partitions are uniform, so no skew can exist. q_funnel is a chain of
  * per-user aggregates and joins all keyed on user_id — one partitioning
  * reused end-to-end; each stage's output only shrinks (monotone funnel),
  * so later joins broadcast under AQE. q_retention shuffles on user_id
  * then on the bounded (cohort, offset) pair.
  */
object TimeSeriesQueries extends QueryModule {

  override def queries: Map[String, Q] = Map(
    "q_resample_ffill" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = t(s, dir, "events")
      val hourly = ev
        .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
        .agg(pround4(sum(col("value").cast("decimal(18,4)")).cast("double")
          / count(lit(1))).as("v"))
      val span = ev.agg(
        date_trunc("hour", min(col("ts"))).as("a"),
        date_trunc("hour", max(col("ts"))).as("b"))
      val grid = ev.select("user_id").distinct()
        .crossJoin(broadcast(span))
        .select(col("user_id"),
          explode(sequence(col("a"), col("b"), expr("interval 1 hour")))
            .as("h"))
      val w = Window.partitionBy("user_id").orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(hourly, Seq("user_id", "h"), "left")
        .select(col("user_id"), col("h"),
          last(col("v"), ignoreNulls = true).over(w).as("v_fill"),
          when(col("v").isNull, 0).otherwise(1).cast("int").as("observed"))
        .orderBy("user_id", "h")
    }),

    // Ordered 3-step funnel with a 6-hour step window: first view →
    // first qualifying click → first qualifying purchase, per user.
    "q_funnel" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val sixH = expr("INTERVAL 6 HOURS")
      val t1 = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("ts1"))
      val t2 = ev.filter(col("event_type") === "click")
        .join(t1, Seq("user_id"))
        .filter(col("ts") > col("ts1") && col("ts") <= col("ts1") + sixH)
        .groupBy("user_id").agg(min(col("ts")).as("ts2"))
      val t3 = ev.filter(col("event_type") === "purchase")
        .join(t2, Seq("user_id"))
        .filter(col("ts") > col("ts2") && col("ts") <= col("ts2") + sixH)
        .groupBy("user_id").agg(min(col("ts")).as("ts3"))
      t1.agg(count(lit(1)).as("step1_view"))
        .crossJoin(t2.agg(count(lit(1)).as("step2_click")))
        .crossJoin(t3.agg(count(lit(1)).as("step3_purchase")))
    }),

    // Path mining: top-20 event-type trigrams across user journeys
    // (behavior n-grams — the sequence-analytics counterpart of
    // q_ngrams). One window scan per user ordered by (ts, event_id)
    // (unique tiebreak), then the word-count plan over path strings;
    // top-k carries the path as tiebreaker.
    "q_path_trigrams" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"),
          lead(col("event_type"), 1).over(w).as("e2"),
          lead(col("event_type"), 2).over(w).as("e3"))
        .filter(col("e2").isNotNull && col("e3").isNotNull)
        .select(concat_ws(">", col("event_type"), col("e2"), col("e3"))
          .as("path"))
        .groupBy("path").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("path"))
        .limit(20)
    }),

    // First-order Markov transition matrix over event types: P(next |
    // current) per user journey — integer pair counts over a bounded
    // (5×5) state space, probabilities as integer ratios under the
    // portable round. Same lead-window scan as q_path_trigrams.
    "q_markov_transitions" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val wf = Window.partitionBy("from_type")
      t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("from_type"),
          lead(col("event_type"), 1).over(w).as("to_type"))
        .filter(col("to_type").isNotNull)
        .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
        .withColumn("p",
          pround4(col("n").cast("double") / sum(col("n")).over(wf)))
        .orderBy("from_type", "to_type")
    }),

    // Retention cohorts on 3-day buckets of purchase activity: cohort =
    // a user's first purchase bucket; one row per (cohort, offset).
    "q_retention" -> ((s, dir) => {
      val wk = floor((unix_timestamp(col("ts")) - lit(1704067200L)) / 259200)
        .cast("bigint")
      val w = t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), wk.as("wk"))
      val f = w.groupBy("user_id").agg(min(col("wk")).as("cohort"))
      w.join(f, Seq("user_id"))
        .groupBy(col("cohort"), (col("wk") - col("cohort")).as("offset_wk"))
        .agg(countDistinct(col("user_id")).as("n_active"))
        .orderBy("cohort", "offset_wk")
    }),

    // Cumulative user growth: per-day first-seen counts and the running
    // total of distinct users ever seen. The running sum's window has NO
    // partition key — fine, because it runs over the DAY-grained relation
    // (bounded by the calendar, not the corpus; the user-grained min is
    // where the data-sized shuffle happens, keyed on user_id).
    "q_user_growth" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .groupBy("user_id")
        .agg(min(date_format(col("ts"), "yyyy-MM-dd")).as("day"))
        .groupBy("day").agg(count(lit(1)).as("new_users"))
        .withColumn("cum_users", sum(col("new_users")).over(w))
        .orderBy("day")
    }),

    // EWMA-smoothed daily event counts (10-day lookback, decay 1/2): the
    // trend-detection smoother. Weights 2^-k are EXACT dyadic doubles and
    // n·2^-k sums stay exact below 2^53, so the smoothed mean is
    // bit-identical cross-engine before the portable round. The weighted
    // window is a self-join with fan-out ≤ 10 over the (type × day)
    // aggregate — bounded by the calendar, never by the event volume.
    "q_ewma" -> ((s, dir) => {
      val d = t(s, dir, "events")
        .groupBy(col("event_type"),
          to_date(date_trunc("day", col("ts"))).as("dday"))
        .agg(count(lit(1)).as("n"))
        .withColumn("di",
          datediff(col("dday"), lit("2024-01-01").cast("date")))
      val a = d.select(col("event_type"), col("dday"), col("n"),
        col("di"))
      val b = d.select(col("event_type").as("b_type"),
        col("n").as("b_n"), col("di").as("b_di"))
      a.join(b, col("event_type") === col("b_type") &&
          col("b_di") >= col("di") - 9 && col("b_di") <= col("di"))
        .groupBy(col("event_type"),
          date_format(col("dday"), "yyyy-MM-dd").as("day"), col("n"))
        .agg(pround4(
          sum(col("b_n") * pow(lit(0.5), col("di") - col("b_di")))
            / sum(pow(lit(0.5), col("di") - col("b_di")))).as("ewma"))
        .orderBy("event_type", "day")
    }),

    // OHLC bars: per (event_type, day), the open/high/low/close of the
    // value series — the financial downsample. First/last are resolved by
    // row_number over (ts, event_id) in BOTH engines (arg_min/min_by tie
    // rules differ across engines; the unique event_id tiebreak makes the
    // pick total). One corpus-sized shuffle on (type, day); the windows
    // run inside those partitions.
    "q_ohlc" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val base = t(s, dir, "events")
        .select(col("event_type"),
          date_format(col("ts"), "yyyy-MM-dd").as("day"),
          col("ts"), col("event_id"), col("value"))
      val wf = Window.partitionBy("event_type", "day")
        .orderBy(col("ts"), col("event_id"))
      val wl = Window.partitionBy("event_type", "day")
        .orderBy(col("ts").desc, col("event_id").desc)
      base
        .withColumn("rnf", row_number().over(wf))
        .withColumn("rnl", row_number().over(wl))
        .groupBy("event_type", "day")
        .agg(count(lit(1)).as("n"),
          pround4(max(when(col("rnf") === 1, col("value")))).as("open"),
          pround4(max(col("value"))).as("high"),
          pround4(min(col("value"))).as("low"),
          pround4(max(when(col("rnl") === 1, col("value")))).as("close"))
        .orderBy("event_type", "day")
    }),

    // Time-weighted average value per event type: each event's value
    // holds until the user's NEXT event (LEAD), weighted by that gap in
    // epoch-µs — the TSDB "time-weighted mean" that plain AVG gets wrong
    // when sampling is irregular. Per-event contributions are exact:
    // value scaled to 1e-4 BIGINT ticks × µs gap, summed in int128
    // (DECIMAL(38,0) ↔ HUGEINT — q_ols2 discipline) so neither engine's
    // double-sum order matters; ONE double division at the end. The LEAD
    // window is keyed on user_id (corpus-sized shuffle); the final
    // aggregate is alphabet-bounded.
    "q_tw_avg" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.DecimalType
      val d38 = DecimalType(38, 0)
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      val seg = t(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("event_id"),
          unix_micros(col("ts")).as("us"),
          floor(col("value") * 10000 + lit(0.5)).cast("long").as("sv"))
        .withColumn("dt", lead(col("us"), 1).over(w) - col("us"))
        .filter(col("dt").isNotNull)
      seg.groupBy("event_type")
        .agg(count(lit(1)).as("n_segments"),
          sum(col("sv").cast(d38) * col("dt")).as("num"),
          sum(col("dt").cast(d38)).as("den"))
        .select(col("event_type"), col("n_segments"),
          pround4(when(col("den") > 0,
            col("num").cast("double") / (col("den").cast("double") * 10000)))
            .as("tw_avg"))
        .orderBy("event_type")
    }),

    // Rolling 7-day active users (WAU) per calendar day: dedup to the
    // (user, day) grain FIRST (that's the corpus-sized shuffle), then a
    // fan-out-≤7 range join against the bounded day list, then one
    // distinct-count keyed on day. Windowed DISTINCT aggregates have no
    // frame form in either engine — the dedup-then-range-join shape IS
    // the scalable plan.
    "q_wau" -> ((s, dir) => {
      val ud = t(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      val days = ud.select(col("d").as("day")).distinct()
      days.join(ud,
          col("d") >= date_sub(col("day"), 6) && col("d") <= col("day"))
        .groupBy(date_format(col("day"), "yyyy-MM-dd").as("day"))
        .agg(countDistinct(col("user_id")).as("wau"))
        .orderBy("day")
    }),

    // Lag-1 autocorrelation of each type's daily-mean-value series — the
    // "is this metric trending or mean-reverting?" diagnostic. The daily
    // mean is computed portably (exact DECIMAL sum ÷ count, one double
    // division) so both engines feed identical series. Pearson is spelled
    // out as explicit sums — not native corr — for two reasons: the same
    // op sequence runs in both engines, and a zero-variance series gets a
    // NULLIF'd denominator (NULL result) instead of Spark-ANSI's
    // divide-by-zero error. One corpus-sized aggregate to the (type, day)
    // grain; the lag window and the sums run on the calendar-bounded
    // series.
    "q_autocorr" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = t(s, dir, "events")
        .groupBy(col("event_type"), col("ts").cast("date").as("d"))
        .agg((sum(col("value").cast("decimal(18,4)")).cast("double")
          / count(col("value"))).as("mv"))
      val w = Window.partitionBy("event_type").orderBy("d")
      daily
        .withColumn("pmv", lag(col("mv"), 1).over(w))
        .filter(col("pmv").isNotNull)
        .groupBy("event_type")
        .agg(count(lit(1)).cast("double").as("n"),
          sum(col("mv")).as("sx"), sum(col("pmv")).as("sy"),
          sum(col("mv") * col("pmv")).as("sxy"),
          sum(col("mv") * col("mv")).as("sxx"),
          sum(col("pmv") * col("pmv")).as("syy"))
        .select(col("event_type"), col("n").cast("bigint").as("n_days"),
          pround4((col("n") * col("sxy") - col("sx") * col("sy")) /
            nullif(sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
              sqrt(col("n") * col("syy") - col("sy") * col("sy")), lit(0.0)))
            .as("ac1"))
        .orderBy("event_type")
    }),

    // Change-data-capture between two snapshots of a grow-only event log:
    // snapshot A = each user's latest (type, value) at the half-way cut
    // (MAX(event_id) DIV 2 — integer arithmetic so both engines cut on
    // the identical row), snapshot B = latest overall. A full outer join
    // on the entity key classifies every user as added (no A state),
    // changed (state differs — null-safe compare), or same; 'removed'
    // can't occur against a grow-only log but the branch is the CDC
    // contract. Both snapshots are one window scan partitioned by
    // user_id over a filtered read; the diff join shuffles both sides on
    // the SAME user_id key — at 100 TB snapshots would be stored
    // bucketed by entity, making the diff join shuffle-free.
    "q_snapshot_diff" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = t(s, dir, "events")
      val cut = ev.agg(expr("MAX(event_id) DIV 2").as("cut"))
      val w = Window.partitionBy("user_id").orderBy(col("event_id").desc)
      def latest(df: org.apache.spark.sql.DataFrame, p: String) = df
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("user_id"), col("event_type").as(p + "_type"),
          col("value").as(p + "_value"))
      val snapA = latest(
        ev.crossJoin(broadcast(cut)).filter(col("event_id") <= col("cut")),
        "a")
      val snapB = latest(ev, "b")
      snapA.join(snapB, Seq("user_id"), "full_outer")
        .select(col("user_id"),
          when(col("a_type").isNull, lit("added"))
            .when(col("b_type").isNull, lit("removed"))
            .when(!(col("a_type") <=> col("b_type")) ||
              !(col("a_value") <=> col("b_value")), lit("changed"))
            .otherwise(lit("same")).as("status"),
          col("a_type"), col("b_type"), col("a_value"), col("b_value"))
        .orderBy("user_id")
    }),

    // Gaps-and-islands: each event opens a 30-minute activity interval;
    // overlapping/touching intervals merge into islands, and the per-user
    // report is (island count, covered seconds, longest island). The
    // canonical SQL algorithm, done order-stably: a new island starts
    // where the interval's start exceeds the running max of all PRIOR
    // ends (cumulative max window), island ids are the running sum of
    // those starts, then two keyed aggregates. All three windows and
    // both aggregates partition on user_id — one shuffle key end to end,
    // per-user partitions, no skew surface. Interval math runs on exact
    // epoch-µs BIGINTs (timestamps never round-trip through doubles).
    "q_gaps_islands" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val iv = t(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("st"))
        .withColumn("en", col("st") + lit(1800000000L))
      val ord = Window.partitionBy("user_id")
        .orderBy(col("st"), col("event_id"))
      val prior = ord.rowsBetween(Window.unboundedPreceding, -1)
      val isl = iv
        .withColumn("pmax", max(col("en")).over(prior))
        .withColumn("new_isl",
          when(col("pmax").isNull || col("st") > col("pmax"), 1L)
            .otherwise(0L))
        .withColumn("island", sum(col("new_isl")).over(
          ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("island"))
        .agg(min(col("st")).as("s0"), max(col("en")).as("e1"))
      isl.groupBy("user_id")
        .agg(count(lit(1)).as("n_islands"),
          sum(expr("(e1 - s0) DIV 1000000")).as("covered_s"),
          max(expr("(e1 - s0) DIV 1000000")).as("longest_s"))
        .orderBy("user_id")
    }),

    // Last-touch attribution: every purchase is credited to the user's
    // most recent PRIOR view/click in the behavioral sequence (event_id
    // order — the same sequence convention the transition graph uses).
    // The prior-window argmax carries only the qualifying event's ID
    // (max over a CASE column — no IGNORE NULLS, no struct-max, both
    // engine-portable hazards); the touch's own attributes attach by a
    // self-join on that ID. Window partitions on user_id; the attach
    // join is id-keyed; unattributed purchases (no prior touch) survive
    // as NULL rows — the report's "organic" bucket.
    "q_attribution" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = t(s, dir, "events")
      val prior = Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val purchases = ev
        .withColumn("attr_event_id",
          max(when(col("event_type").isin("view", "click"),
            col("event_id"))).over(prior))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("attr_event_id"))
      val touches = ev.select(col("event_id").as("t_id"),
        col("event_type").as("attr_type"))
      purchases
        .join(touches, purchases("attr_event_id") === touches("t_id"),
          "left")
        .select(col("event_id"), col("user_id"), col("attr_event_id"),
          col("attr_type"),
          (col("event_id") - col("attr_event_id")).as("gap"))
        .orderBy("event_id")
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "q_resample_ffill" ->
      """WITH b AS (SELECT user_id, DATE_TRUNC('hour', ts) AS h,
        |    FLOOR((CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
        |      / COUNT(*)) * 10000 + 0.5) / 10000 AS v
        |  FROM events GROUP BY user_id, h),
        |span AS (SELECT DATE_TRUNC('hour', MIN(ts)) AS a,
        |    DATE_TRUNC('hour', MAX(ts)) AS b FROM events),
        |grid AS (SELECT u.user_id, g.h
        |  FROM (SELECT DISTINCT user_id FROM events) u
        |  CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(a, b, INTERVAL 1 HOUR))
        |    AS h FROM span) g),
        |j AS (SELECT grid.user_id, grid.h, b.v
        |  FROM grid LEFT JOIN b USING (user_id, h))
        |SELECT user_id, h,
        |  LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY h
        |    ROWS UNBOUNDED PRECEDING) AS v_fill,
        |  CAST(CASE WHEN v IS NULL THEN 0 ELSE 1 END AS INT) AS observed
        |FROM j ORDER BY user_id, h""".stripMargin,

    "q_funnel" ->
      """WITH t1 AS (SELECT user_id, MIN(ts) AS ts1 FROM events
        |    WHERE event_type = 'view' GROUP BY user_id),
        |t2 AS (SELECT e.user_id, MIN(e.ts) AS ts2 FROM events e
        |    JOIN t1 ON e.user_id = t1.user_id
        |    WHERE e.event_type = 'click' AND e.ts > t1.ts1
        |      AND e.ts <= t1.ts1 + INTERVAL 6 HOUR GROUP BY e.user_id),
        |t3 AS (SELECT e.user_id, MIN(e.ts) AS ts3 FROM events e
        |    JOIN t2 ON e.user_id = t2.user_id
        |    WHERE e.event_type = 'purchase' AND e.ts > t2.ts2
        |      AND e.ts <= t2.ts2 + INTERVAL 6 HOUR GROUP BY e.user_id)
        |SELECT (SELECT COUNT(*) FROM t1) AS step1_view,
        |       (SELECT COUNT(*) FROM t2) AS step2_click,
        |       (SELECT COUNT(*) FROM t3) AS step3_purchase""".stripMargin,

    "q_path_trigrams" ->
      """WITH s AS (SELECT user_id, event_type,
        |    LEAD(event_type, 1) OVER w AS e2,
        |    LEAD(event_type, 2) OVER w AS e3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |p AS (SELECT event_type || '>' || e2 || '>' || e3 AS path FROM s
        |  WHERE e2 IS NOT NULL AND e3 IS NOT NULL)
        |SELECT path, COUNT(*) AS n FROM p GROUP BY path
        |ORDER BY n DESC, path LIMIT 20""".stripMargin,

    "q_markov_transitions" ->
      """WITH s AS (SELECT event_type AS from_type,
        |    LEAD(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |c AS (SELECT from_type, to_type, COUNT(*) AS n FROM s
        |  WHERE to_type IS NOT NULL GROUP BY from_type, to_type)
        |SELECT from_type, to_type, n,
        |  FLOOR((CAST(n AS DOUBLE) /
        |    SUM(n) OVER (PARTITION BY from_type)) * 10000 + 0.5) / 10000
        |    AS p
        |FROM c ORDER BY from_type, to_type""".stripMargin,

    "q_retention" ->
      """WITH w AS (SELECT user_id,
        |    CAST(FLOOR((FLOOR(EPOCH(ts)) - 1704067200) / 259200) AS BIGINT)
        |      AS wk
        |  FROM events WHERE event_type = 'purchase'),
        |f AS (SELECT user_id, MIN(wk) AS cohort FROM w GROUP BY user_id)
        |SELECT f.cohort, w.wk - f.cohort AS offset_wk,
        |  COUNT(DISTINCT w.user_id) AS n_active
        |FROM w JOIN f USING (user_id)
        |GROUP BY cohort, offset_wk ORDER BY cohort, offset_wk""".stripMargin,

    "q_user_growth" ->
      """WITH fs AS (SELECT user_id, MIN(STRFTIME(ts, '%Y-%m-%d')) AS day
        |    FROM events GROUP BY user_id),
        |d AS (SELECT day, COUNT(*) AS new_users FROM fs GROUP BY day)
        |SELECT day, new_users,
        |  CAST(SUM(new_users) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
        |    AS BIGINT) AS cum_users
        |FROM d ORDER BY day""".stripMargin,

    "q_ewma" ->
      """WITH d AS (SELECT event_type,
        |    CAST(DATE_TRUNC('day', ts) AS DATE) AS dday, COUNT(*) AS n
        |  FROM events GROUP BY event_type, dday),
        |i AS (SELECT event_type, dday, n,
        |    DATEDIFF('day', DATE '2024-01-01', dday) AS di FROM d)
        |SELECT a.event_type, STRFTIME(a.dday, '%Y-%m-%d') AS day, a.n,
        |  FLOOR((SUM(b.n * POWER(0.5, a.di - b.di))
        |    / SUM(POWER(0.5, a.di - b.di))) * 10000 + 0.5) / 10000 AS ewma
        |FROM i a JOIN i b ON a.event_type = b.event_type
        |  AND b.di >= a.di - 9 AND b.di <= a.di
        |GROUP BY a.event_type, a.dday, a.n
        |ORDER BY a.event_type, day""".stripMargin,

    "q_ohlc" ->
      s"""WITH base AS (
         |  SELECT event_type, STRFTIME(ts, '%Y-%m-%d') AS day, value,
         |    ROW_NUMBER() OVER (PARTITION BY event_type, STRFTIME(ts, '%Y-%m-%d')
         |      ORDER BY ts, event_id) AS rnf,
         |    ROW_NUMBER() OVER (PARTITION BY event_type, STRFTIME(ts, '%Y-%m-%d')
         |      ORDER BY ts DESC, event_id DESC) AS rnl
         |  FROM events)
         |SELECT event_type, day, COUNT(*) AS n,
         |  ${sqlRound4("MAX(CASE WHEN rnf = 1 THEN value END)")} AS open,
         |  ${sqlRound4("MAX(value)")} AS high,
         |  ${sqlRound4("MIN(value)")} AS low,
         |  ${sqlRound4("MAX(CASE WHEN rnl = 1 THEN value END)")} AS close
         |FROM base GROUP BY event_type, day
         |ORDER BY event_type, day""".stripMargin,

    "q_tw_avg" ->
      s"""WITH seg AS (
         |  SELECT user_id, event_type, event_id, EPOCH_US(ts) AS us,
         |    CAST(FLOOR(value * 10000 + 0.5) AS BIGINT) AS sv,
         |    LEAD(EPOCH_US(ts)) OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) - EPOCH_US(ts) AS dt
         |  FROM events)
         |SELECT event_type, COUNT(*) AS n_segments,
         |  ${sqlRound4(
             "CASE WHEN SUM(CAST(dt AS HUGEINT)) > 0 THEN " +
             "CAST(SUM(CAST(sv AS HUGEINT) * dt) AS DOUBLE) / " +
             "(CAST(SUM(CAST(dt AS HUGEINT)) AS DOUBLE) * 10000) END")}
         |    AS tw_avg
         |FROM seg WHERE dt IS NOT NULL
         |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_wau" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
        |    FROM events),
        |days AS (SELECT DISTINCT d AS day FROM ud)
        |SELECT STRFTIME(days.day, '%Y-%m-%d') AS day,
        |  COUNT(DISTINCT ud.user_id) AS wau
        |FROM days JOIN ud ON ud.d >= days.day - 6 AND ud.d <= days.day
        |GROUP BY days.day ORDER BY day""".stripMargin,

    "q_autocorr" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
        |      / COUNT(value) AS mv
        |  FROM events GROUP BY event_type, CAST(ts AS DATE)),
        |lagd AS (SELECT event_type, mv,
        |    LAG(mv) OVER (PARTITION BY event_type ORDER BY d) AS pmv
        |  FROM daily),
        |s AS (SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n,
        |    SUM(mv) AS sx, SUM(pmv) AS sy, SUM(mv * pmv) AS sxy,
        |    SUM(mv * mv) AS sxx, SUM(pmv * pmv) AS syy
        |  FROM lagd WHERE pmv IS NOT NULL GROUP BY event_type)
        |SELECT event_type, CAST(n AS BIGINT) AS n_days,
        |  FLOOR((n * sxy - sx * sy) /
        |    NULLIF(SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy), 0)
        |    * 10000 + 0.5) / 10000 AS ac1
        |FROM s ORDER BY event_type""".stripMargin,

    "q_snapshot_diff" ->
      """WITH cut AS (SELECT MAX(event_id) // 2 AS cut FROM events),
        |a AS (SELECT user_id, event_type AS a_type, value AS a_value
        |  FROM (SELECT user_id, event_type, value,
        |      ROW_NUMBER() OVER (PARTITION BY user_id
        |        ORDER BY event_id DESC) AS rn
        |    FROM events WHERE event_id <= (SELECT cut FROM cut))
        |  WHERE rn = 1),
        |b AS (SELECT user_id, event_type AS b_type, value AS b_value
        |  FROM (SELECT user_id, event_type, value,
        |      ROW_NUMBER() OVER (PARTITION BY user_id
        |        ORDER BY event_id DESC) AS rn
        |    FROM events)
        |  WHERE rn = 1)
        |SELECT COALESCE(a.user_id, b.user_id) AS user_id,
        |  CASE WHEN a_type IS NULL THEN 'added'
        |       WHEN b_type IS NULL THEN 'removed'
        |       WHEN a_type IS DISTINCT FROM b_type
        |         OR a_value IS DISTINCT FROM b_value THEN 'changed'
        |       ELSE 'same' END AS status,
        |  a_type, b_type, a_value, b_value
        |FROM a FULL JOIN b ON a.user_id = b.user_id
        |ORDER BY user_id""".stripMargin,

    "q_gaps_islands" ->
      """WITH iv AS (SELECT user_id, event_id, EPOCH_US(ts) AS st,
        |    EPOCH_US(ts) + 1800000000 AS en FROM events),
        |pm AS (SELECT user_id, event_id, st, en,
        |    MAX(en) OVER (PARTITION BY user_id ORDER BY st, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        |  FROM iv),
        |fl AS (SELECT user_id, event_id, st, en,
        |    CASE WHEN pmax IS NULL OR st > pmax THEN 1 ELSE 0 END AS f
        |  FROM pm),
        |il AS (SELECT user_id, st, en,
        |    SUM(f) OVER (PARTITION BY user_id ORDER BY st, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM fl),
        |g AS (SELECT user_id, island, MIN(st) AS s0, MAX(en) AS e1
        |  FROM il GROUP BY user_id, island)
        |SELECT user_id, COUNT(*) AS n_islands,
        |  CAST(SUM((e1 - s0) // 1000000) AS BIGINT) AS covered_s,
        |  CAST(MAX((e1 - s0) // 1000000) AS BIGINT) AS longest_s
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_attribution" ->
      """WITH w AS (SELECT event_id, user_id, event_type,
        |    MAX(CASE WHEN event_type IN ('view', 'click')
        |      THEN event_id END)
        |      OVER (PARTITION BY user_id ORDER BY event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS attr_event_id
        |  FROM events),
        |p AS (SELECT event_id, user_id, attr_event_id FROM w
        |  WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.attr_event_id,
        |  t.event_type AS attr_type,
        |  p.event_id - p.attr_event_id AS gap
        |FROM p LEFT JOIN events t ON t.event_id = p.attr_event_id
        |ORDER BY p.event_id""".stripMargin
  )
}

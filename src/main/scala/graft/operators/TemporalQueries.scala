package graft.operators

import graft.QueryModule
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.3 M — temporal state management over the `events` log:
  * the dimension-history / CDC-apply / regime-detection operators a
  * warehouse keeps next to the behavioral analytics family.
  *
  *   - q_scd2: Type-2 slowly-changing-dimension history of each user's
  *     event_type state — consecutive duplicates collapse into versioned
  *     validity rows [valid_from, valid_to) with an is_current flag (the
  *     run-length view that q_gaps_islands' interval merge does NOT
  *     produce: here a run closes on any state CHANGE, not on a time gap).
  *   - q_merge_upsert: MERGE-INTO semantics — apply the post-cut delta
  *     (latest state per user after MAX(event_id) DIV 2) onto the base
  *     snapshot, with 'error' deltas acting as DELETEs. The APPLY
  *     counterpart of q_snapshot_diff's classify.
  *   - q_changepoint: CUSUM level-shift detection on per-type daily
  *     counts — the argmax of |Σ(cntⱼ − μ)| locates the regime change;
  *     reported with the before/after mean shift.
  *   - q_seasonality: day-of-week activity index per event type (mean
  *     daily count on that weekday / overall mean daily count) — the
  *     seasonal-profile view behind traffic normalization.
  *
  * Determinism:
  *   - SCD2 runs are keyed by a LAG-change running sum over the unique
  *     (ts, event_id) order; validity bounds are MIN(ts)/LEAD — no floats.
  *   - CUSUM is kept exact by clearing the mean's denominator:
  *     (cntⱼ − tot/nd)·nd = cntⱼ·nd − tot, so the running sum and the
  *     argmax both ride BIGINTs; only the final report divides (portable
  *     round). Ties on |CUSUM| break on the earlier day.
  *   - Day-of-week avoids both engines' DOW dialects (Spark 1=Sunday,
  *     DuckDB 0=Sunday) with integer arithmetic on days-since-epoch:
  *     (days + 4) % 7, Sunday = 0 (1970-01-01 was a Thursday).
  *
  * Scale notes (100 TB lens): every window and aggregate in q_scd2 /
  * q_merge_upsert partitions on user_id — one shuffle key end to end,
  * and the merge join co-partitions base and delta on that same key (at
  * scale both snapshots live bucketed by entity, making the MERGE
  * shuffle-free — the q_snapshot_diff posture). q_changepoint /
  * q_seasonality aggregate to the (type, day) grain FIRST — everything
  * downstream is bounded by |types| × |days|, not by the event stream;
  * the cp attach join broadcasts a |types|-row relation.
  */
object TemporalQueries extends QueryModule {

  /** SCD2 user cap: bounds the emitted history while exercising every
    * run/version/current edge on thousands of rows at sf0.1. */
  private val ScdUsers = 25

  /** Latest (event_type, value) per user over one side of the cut. */
  private def latestState(df: DataFrame, p: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("event_id").desc)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as(p + "_type"),
        col("value").as(p + "_value"))
  }

  override def queries: Map[String, Q] = Map(
    // Type-2 dimension history: one row per maximal run of a constant
    // event_type state per user, versioned in sequence order.
    "q_scd2" -> ((s, dir) => {
      val seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val run = Window.partitionBy("user_id").orderBy("version")
      t(s, dir, "events")
        .filter(col("user_id") < ScdUsers)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .withColumn("chg",
          when(lag(col("event_type"), 1).over(seq).isNull ||
            lag(col("event_type"), 1).over(seq) =!= col("event_type"), 1L)
            .otherwise(0L))
        .withColumn("version", sum(col("chg")).over(
          seq.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("version"))
        .agg(min(col("event_type")).as("state"), // constant within a run
          min(col("ts")).as("valid_from"), count(lit(1)).as("n_events"))
        .withColumn("valid_to", lead(col("valid_from"), 1).over(run))
        .withColumn("is_current",
          when(col("valid_to").isNull, 1).otherwise(0))
        .select(col("user_id"), col("version"), col("state"),
          col("valid_from"), col("valid_to"), col("is_current"),
          col("n_events"))
        .orderBy("user_id", "version")
    }),

    // MERGE-INTO: base snapshot ← post-cut delta; 'error' deltas delete,
    // unknown users insert, known users update, untouched users keep.
    "q_merge_upsert" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val cut = ev.agg(expr("MAX(event_id) DIV 2").as("cut"))
      val withCut = ev.crossJoin(broadcast(cut))
      val base = latestState(withCut.filter(col("event_id") <= col("cut")), "b")
      val delta = latestState(withCut.filter(col("event_id") > col("cut")), "d")
      base.join(delta, Seq("user_id"), "full_outer")
        .filter(col("d_type").isNull || col("d_type") =!= "error")
        .select(col("user_id"),
          when(col("d_type").isNull, lit("kept"))
            .when(col("b_type").isNull, lit("inserted"))
            .otherwise(lit("updated")).as("action"),
          coalesce(col("d_type"), col("b_type")).as("cur_type"),
          coalesce(col("d_value"), col("b_value")).as("cur_value"))
        .orderBy("user_id")
    }),

    // CUSUM changepoint per event type on daily counts; the running
    // deviation sum is exact via (cnt·nd − tot) BIGINTs.
    "q_changepoint" -> ((s, dir) => {
      // daily feeds both the CUSUM chain and the before/after attach —
      // materialize the (type × day)-grained rollup so the corpus scans
      // once (the relation is |types|·|days| rows)
      val daily = graft.functions.Materialize(t(s, dir, "events")
        .groupBy(col("event_type"), col("ts").cast("date").as("d"))
        .agg(count(lit(1)).as("cnt")))
      val full = Window.partitionBy("event_type")
      val cum = Window.partitionBy("event_type").orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cus = daily
        .withColumn("tot", sum(col("cnt")).over(full))
        .withColumn("nd", count(lit(1)).over(full))
        .withColumn("cus",
          sum(col("cnt") * col("nd") - col("tot")).over(cum))
      val cp = cus
        .withColumn("rn", row_number().over(Window
          .partitionBy("event_type").orderBy(abs(col("cus")).desc, col("d"))))
        .filter(col("rn") === 1)
        .select(col("event_type").as("cp_type"), col("d").as("cp_date"),
          col("cus").as("cus_cp"), col("nd"))
      daily.join(broadcast(cp), col("event_type") === col("cp_type"))
        .groupBy(col("event_type"))
        .agg(max(col("nd")).as("n_days"), max(col("cp_date")).as("cp_date"),
          max(col("cus_cp")).as("cus_cp"),
          sum(when(col("d") <= col("cp_date"), col("cnt"))).as("sb"),
          sum(when(col("d") <= col("cp_date"), 1L).otherwise(0L)).as("nb"),
          sum(when(col("d") > col("cp_date"), col("cnt"))).as("sa"),
          sum(when(col("d") > col("cp_date"), 1L).otherwise(0L)).as("na"))
        .select(col("event_type"),
          date_format(col("cp_date"), "yyyy-MM-dd").as("cp_date"),
          col("n_days"),
          pround4(col("cus_cp").cast("double") / col("n_days")).as("cusum"),
          pround4(col("sa").cast("double") / nullif(col("na"), lit(0L)) -
            col("sb").cast("double") / col("nb")).as("shift"))
        .orderBy("event_type")
    }),

    // 7-day rolling Pearson correlation between the view and purchase
    // daily-count series — the co-movement monitor behind any
    // conversion-health dashboard. All six rolling sums are INTEGER
    // (counts and their products), so the window frame is exact in both
    // engines regardless of their aggregation trees; only the final
    // Pearson ratio divides, and sqrt is correctly-rounded IEEE in both.
    // The day-grain series is tiny by construction (the corpus collapses
    // to |days| rows first), so the single-partition ordered window is
    // the right plan at any corpus size.
    "q_rolling_corr" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .filter(col("event_type").isin("view", "purchase"))
        .groupBy(col("ts").cast("date").as("d"))
        .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L))
            .as("x"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("y"))
      val w7 = Window.orderBy("d").rowsBetween(-6, 0)
      daily
        .withColumn("n", count(lit(1)).over(w7))
        .withColumn("sx", sum(col("x")).over(w7))
        .withColumn("sy", sum(col("y")).over(w7))
        .withColumn("sxy", sum(col("x") * col("y")).over(w7))
        .withColumn("sxx", sum(col("x") * col("x")).over(w7))
        .withColumn("syy", sum(col("y") * col("y")).over(w7))
        .select(date_format(col("d"), "yyyy-MM-dd").as("d"),
          col("n").as("n_win"),
          pround4((col("n") * col("sxy") - col("sx") * col("sy"))
            .cast("double") /
            nullif(sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
              .cast("double")) *
              sqrt((col("n") * col("syy") - col("sy") * col("sy"))
                .cast("double")), lit(0.0))).as("r"))
        .orderBy("d")
    }),

    // Lead/lag cross-correlation between the same two series at lags
    // −3..+3 days: corr(view_t, purchase_{t+lag}) — does activity LEAD
    // conversion? Same exact-integer-sums discipline as q_rolling_corr;
    // the lag fan-out is a 7-row broadcast over the day-grain relation.
    "q_xcorr" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .filter(col("event_type").isin("view", "purchase"))
        .groupBy(col("ts").cast("date").as("d"))
        .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L))
            .as("x"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("y"))
      val b = daily.select(col("d").as("d2"), col("y"))
      daily.select(col("d"), col("x"),
          explode(sequence(lit(-3), lit(3))).as("lag")) // Generate, no join
        .join(b, date_add(col("d"), col("lag")) === col("d2"))
        .groupBy("lag")
        .agg(count(lit(1)).as("n_days"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .select(col("lag"), col("n_days"),
          pround4((col("n_days") * col("sxy") - col("sx") * col("sy"))
            .cast("double") /
            nullif(sqrt((col("n_days") * col("sxx") - col("sx") * col("sx"))
              .cast("double")) *
              sqrt((col("n_days") * col("syy") - col("sy") * col("sy"))
                .cast("double")), lit(0.0))).as("r"))
        .orderBy("lag")
    }),

    // Time-to-convert: per user, latency from first view to first later
    // purchase; the quartile profile of that latency is the
    // conversion-velocity report (the survival-analysis-lite view the
    // funnel's step counts don't give). Two user-keyed aggregates and
    // one co-keyed join; latencies are exact epoch-second BIGINTs and
    // the quartiles are quarter-exact (the q_percentile analysis).
    "q_time_to_convert" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val fv = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("tv"))
      val fp = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id").agg(min(col("ts")).as("tp"))
      fv.join(fp, Seq("user_id"))
        .filter(col("tp") > col("tv"))
        .select(expr("(unix_micros(tp) - unix_micros(tv)) DIV 1000000")
          .as("secs"))
        .agg(count(lit(1)).as("n_users"),
          pround4(expr("percentile(secs, 0.25D)")).as("p25_s"),
          pround4(expr("percentile(secs, 0.5D)")).as("p50_s"),
          pround4(expr("percentile(secs, 0.75D)")).as("p75_s"),
          pround4(sum(col("secs")).cast("double") / count(lit(1)))
            .as("mean_s"))
    }),

    // Day-of-week seasonality index per event type over daily counts.
    "q_seasonality" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .groupBy(col("event_type"), col("ts").cast("date").as("d"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("dow",
          (datediff(col("d"), to_date(lit("1970-01-01"))) + 4) % 7)
      val full = Window.partitionBy("event_type")
      daily
        .withColumn("tot", sum(col("cnt")).over(full))
        .withColumn("ndays", count(lit(1)).over(full))
        .groupBy(col("event_type"), col("dow"))
        .agg(count(lit(1)).as("n_days"),
          pround4(sum(col("cnt")).cast("double") / count(lit(1)))
            .as("mean_cnt"),
          pround4((sum(col("cnt")).cast("double") / count(lit(1))) /
            (max(col("tot")).cast("double") / max(col("ndays"))))
            .as("idx"))
        .orderBy("event_type", "dow")
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "q_scd2" ->
      s"""WITH seq AS (
         |  SELECT user_id, ts, event_id, event_type,
         |    CASE WHEN LAG(event_type) OVER w IS NULL
         |           OR LAG(event_type) OVER w <> event_type
         |         THEN 1 ELSE 0 END AS chg
         |  FROM events WHERE user_id < $ScdUsers
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |runs AS (
         |  SELECT user_id, ts, event_type,
         |    CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version
         |  FROM seq),
         |hist AS (
         |  SELECT user_id, version, MIN(event_type) AS state,
         |    MIN(ts) AS valid_from, COUNT(*) AS n_events
         |  FROM runs GROUP BY user_id, version)
         |SELECT user_id, version, state, valid_from,
         |  LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY version)
         |    AS valid_to,
         |  CASE WHEN LEAD(valid_from) OVER (PARTITION BY user_id
         |    ORDER BY version) IS NULL THEN 1 ELSE 0 END AS is_current,
         |  n_events
         |FROM hist ORDER BY user_id, version""".stripMargin,

    "q_merge_upsert" ->
      """WITH cut AS (SELECT MAX(event_id) // 2 AS cut FROM events),
        |base AS (
        |  SELECT user_id, event_type AS b_type, value AS b_value
        |  FROM (SELECT user_id, event_type, value,
        |      ROW_NUMBER() OVER (PARTITION BY user_id
        |        ORDER BY event_id DESC) AS rn
        |    FROM events WHERE event_id <= (SELECT cut FROM cut))
        |  WHERE rn = 1),
        |delta AS (
        |  SELECT user_id, event_type AS d_type, value AS d_value
        |  FROM (SELECT user_id, event_type, value,
        |      ROW_NUMBER() OVER (PARTITION BY user_id
        |        ORDER BY event_id DESC) AS rn
        |    FROM events WHERE event_id > (SELECT cut FROM cut))
        |  WHERE rn = 1)
        |SELECT COALESCE(b.user_id, d.user_id) AS user_id,
        |  CASE WHEN d_type IS NULL THEN 'kept'
        |       WHEN b_type IS NULL THEN 'inserted'
        |       ELSE 'updated' END AS action,
        |  COALESCE(d_type, b_type) AS cur_type,
        |  COALESCE(d_value, b_value) AS cur_value
        |FROM base b FULL JOIN delta d ON b.user_id = d.user_id
        |WHERE d_type IS NULL OR d_type <> 'error'
        |ORDER BY COALESCE(b.user_id, d.user_id)""".stripMargin,

    "q_changepoint" ->
      s"""WITH daily AS (
         |  SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS cnt
         |  FROM events GROUP BY event_type, CAST(ts AS DATE)),
         |ann AS (
         |  SELECT *, SUM(cnt) OVER (PARTITION BY event_type) AS tot,
         |    COUNT(*) OVER (PARTITION BY event_type) AS nd
         |  FROM daily),
         |cus AS (
         |  SELECT *, SUM(cnt * nd - tot) OVER (PARTITION BY event_type
         |    ORDER BY d ROWS UNBOUNDED PRECEDING) AS cus
         |  FROM ann),
         |cp AS (
         |  SELECT event_type AS cp_type, d AS cp_date, cus AS cus_cp, nd
         |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
         |          ORDER BY ABS(cus) DESC, d) AS rn FROM cus)
         |  WHERE rn = 1)
         |SELECT event_type, STRFTIME(MAX(cp_date), '%Y-%m-%d') AS cp_date,
         |  MAX(nd) AS n_days,
         |  ${sqlRound4("CAST(MAX(cus_cp) AS DOUBLE) / MAX(nd)")} AS cusum,
         |  ${sqlRound4(
             "CAST(SUM(CASE WHEN d > cp_date THEN cnt END) AS DOUBLE) / " +
             "NULLIF(SUM(CASE WHEN d > cp_date THEN 1 ELSE 0 END), 0) - " +
             "CAST(SUM(CASE WHEN d <= cp_date THEN cnt END) AS DOUBLE) / " +
             "SUM(CASE WHEN d <= cp_date THEN 1 ELSE 0 END)")} AS shift
         |FROM daily JOIN cp ON event_type = cp_type
         |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_rolling_corr" ->
      s"""WITH daily AS (
         |  SELECT CAST(ts AS DATE) AS d,
         |    SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS x,
         |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
         |  FROM events WHERE event_type IN ('view', 'purchase')
         |  GROUP BY CAST(ts AS DATE)),
         |w AS (
         |  SELECT d,
         |    COUNT(*) OVER win AS n,
         |    SUM(x) OVER win AS sx, SUM(y) OVER win AS sy,
         |    SUM(x * y) OVER win AS sxy,
         |    SUM(x * x) OVER win AS sxx, SUM(y * y) OVER win AS syy
         |  FROM daily
         |  WINDOW win AS (ORDER BY d ROWS BETWEEN 6 PRECEDING
         |    AND CURRENT ROW))
         |SELECT STRFTIME(d, '%Y-%m-%d') AS d, CAST(n AS BIGINT) AS n_win,
         |  ${sqlRound4(
             "CAST(n * sxy - sx * sy AS DOUBLE) / " +
             "NULLIF(SQRT(CAST(n * sxx - sx * sx AS DOUBLE)) * " +
             "SQRT(CAST(n * syy - sy * sy AS DOUBLE)), 0)")} AS r
         |FROM w ORDER BY d""".stripMargin,

    "q_xcorr" ->
      s"""WITH daily AS (
         |  SELECT CAST(ts AS DATE) AS d,
         |    SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS x,
         |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
         |  FROM events WHERE event_type IN ('view', 'purchase')
         |  GROUP BY CAST(ts AS DATE)),
         |lags AS (SELECT CAST(u.lag AS INT) AS lag
         |  FROM UNNEST(RANGE(-3, 4)) AS u(lag)),
         |pairs AS (
         |  SELECT l.lag, a.x, b.y
         |  FROM daily a CROSS JOIN lags l
         |  JOIN daily b ON a.d + l.lag = b.d),
         |g AS (
         |  SELECT lag, COUNT(*) AS n_days,
         |    SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
         |    SUM(x * x) AS sxx, SUM(y * y) AS syy
         |  FROM pairs GROUP BY lag)
         |SELECT lag, CAST(n_days AS BIGINT) AS n_days,
         |  ${sqlRound4(
             "CAST(n_days * sxy - sx * sy AS DOUBLE) / " +
             "NULLIF(SQRT(CAST(n_days * sxx - sx * sx AS DOUBLE)) * " +
             "SQRT(CAST(n_days * syy - sy * sy AS DOUBLE)), 0)")} AS r
         |FROM g ORDER BY lag""".stripMargin,

    "q_time_to_convert" ->
      s"""WITH fv AS (SELECT user_id, MIN(ts) AS tv FROM events
         |  WHERE event_type = 'view' GROUP BY user_id),
         |fp AS (SELECT user_id, MIN(ts) AS tp FROM events
         |  WHERE event_type = 'purchase' GROUP BY user_id),
         |lat AS (SELECT (EPOCH_US(tp) - EPOCH_US(tv)) // 1000000 AS secs
         |  FROM fv JOIN fp USING (user_id) WHERE tp > tv)
         |SELECT COUNT(*) AS n_users,
         |  ${sqlRound4("QUANTILE_CONT(secs, 0.25)")} AS p25_s,
         |  ${sqlRound4("QUANTILE_CONT(secs, 0.50)")} AS p50_s,
         |  ${sqlRound4("QUANTILE_CONT(secs, 0.75)")} AS p75_s,
         |  ${sqlRound4("CAST(SUM(secs) AS DOUBLE) / COUNT(*)")} AS mean_s
         |FROM lat""".stripMargin,

    "q_seasonality" ->
      s"""WITH daily AS (
         |  SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS cnt,
         |    (DATE_DIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) + 4) % 7
         |      AS dow
         |  FROM events GROUP BY event_type, CAST(ts AS DATE)),
         |ann AS (
         |  SELECT *, SUM(cnt) OVER (PARTITION BY event_type) AS tot,
         |    COUNT(*) OVER (PARTITION BY event_type) AS ndays
         |  FROM daily)
         |SELECT event_type, dow, COUNT(*) AS n_days,
         |  ${sqlRound4("CAST(SUM(cnt) AS DOUBLE) / COUNT(*)")} AS mean_cnt,
         |  ${sqlRound4(
             "(CAST(SUM(cnt) AS DOUBLE) / COUNT(*)) / " +
             "(CAST(MAX(tot) AS DOUBLE) / MAX(ndays))")} AS idx
         |FROM ann GROUP BY event_type, dow
         |ORDER BY event_type, dow""".stripMargin
  )
}

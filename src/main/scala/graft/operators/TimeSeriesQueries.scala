package graft.operators

import graft.QueryModule
import org.apache.spark.sql.functions._

/** SURVEY.md §2.3 L — time-series regularization over `events`: resample
  * an irregular event stream onto a fixed hourly grid and forward-fill
  * observation gaps (the standard feature-engineering step before any
  * sequence model, and the batch twin of a streaming gap-fill).
  *
  * Determinism: the per-bucket mean uses the exact-decimal dsum→double→
  * portable-round pattern; the forward fill then only carries already-
  * rounded values, so both engines fill identical doubles.
  *
  * Scale notes: the grid is |users| × |hours| by construction — a
  * deliberate densification, so output size is the operator's contract,
  * not a blowup. The span aggregate is a 1-row broadcast; the grid⋈bucket
  * join shuffles both sides on the SAME (user_id, hour) key; the fill is
  * one window scan partitioned by user_id, and the grid is uniform per
  * user, so no skewed partition can exist.
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
        |FROM j ORDER BY user_id, h""".stripMargin
  )
}

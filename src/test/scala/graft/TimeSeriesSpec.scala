package graft

import org.apache.spark.sql.functions._

/** Semantic checks for the time-series regularization operators. */
class TimeSeriesSpec extends SparkSpec {

  test("q_resample_ffill: grid is dense, fill carries last observation") {
    val rows = q("q_resample_ffill").collect()
    val ev = table("events")
    val users = ev.select("user_id").distinct().count()
    val hours = ev.agg(
      (floor(unix_timestamp(max(col("ts"))) / 3600) -
        floor(unix_timestamp(min(col("ts"))) / 3600) + 1).as("n"))
      .head().getLong(0)
    assert(rows.length == users * hours, s"grid ${rows.length} != $users*$hours")
    // observed rows = distinct (user, hour) buckets in the raw stream
    val buckets = ev.select(col("user_id"), date_trunc("hour", col("ts")))
      .distinct().count()
    assert(rows.count(_.getAs[Int]("observed") == 1) == buckets)
    // per user: v_fill is null strictly before the first observation,
    // non-null from it onward (ordered scan of the collected grid)
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[java.sql.Timestamp]("h").getTime)
      val firstObs = sorted.indexWhere(_.getAs[Int]("observed") == 1)
      sorted.zipWithIndex.foreach { case (r, i) =>
        val isNull = r.isNullAt(r.fieldIndex("v_fill"))
        if (firstObs < 0 || i < firstObs) assert(isNull)
        else assert(!isNull)
      }
    }
  }
}

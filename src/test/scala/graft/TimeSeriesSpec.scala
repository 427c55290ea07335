package graft

import org.apache.spark.sql.functions._

/** Semantic checks for the time-series regularization operators. */
class TimeSeriesSpec extends SparkSpec {

  test("Profiler.profile: per-column stats on a frame with nulls") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(2.5), Some("a")),
      (2L, None, Some("c")),
      (3L, Some(7.5), None),
      (4L, Some(2.5), Some("b"))).toDF("id", "x", "s")
    val p = graft.operators.Profiler.profile(df).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    assert(p("id").getAs[Long]("null_cnt") == 0)
    assert(p("id").getAs[Long]("n_distinct") == 4)
    assert(p("id").getAs[Double]("min_num") == 1.0)
    assert(p("x").getAs[Long]("null_cnt") == 1)
    assert(p("x").getAs[Long]("n_distinct") == 2)
    assert(p("x").getAs[Double]("max_num") == 7.5)
    assert(p("s").getAs[Long]("null_cnt") == 1)
    assert(p("s").getAs[String]("min_str") == "a")
    assert(p("s").getAs[String]("max_str") == "c")
  }

  test("q_funnel: step counts are monotone non-increasing") {
    val r = q("q_funnel").head()
    val (s1, s2, s3) = (r.getAs[Long]("step1_view"),
      r.getAs[Long]("step2_click"), r.getAs[Long]("step3_purchase"))
    assert(s1 >= s2 && s2 >= s3, s"funnel not monotone: $s1 $s2 $s3")
    assert(s1 > 0)
  }

  test("q_retention: offset-0 activity equals cohort size") {
    val rows = q("q_retention").collect()
    assert(rows.nonEmpty)
    // every user is active in their own cohort bucket by definition, so
    // per cohort the offset-0 row must count the whole cohort — i.e. it
    // must be the max across that cohort's offsets.
    rows.groupBy(_.getAs[Long]("cohort")).foreach { case (c, rs) =>
      val at0 = rs.find(_.getAs[Long]("offset_wk") == 0L)
      assert(at0.isDefined, s"cohort $c missing offset 0")
      val n0 = at0.get.getAs[Long]("n_active")
      assert(rs.forall(_.getAs[Long]("n_active") <= n0),
        s"cohort $c has an offset larger than its own size")
    }
  }

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

  test("q_user_growth: new_users sum to the distinct-user count; cum monotone") {
    val rows = q("q_user_growth").collect()
    val users = table("events").select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("new_users")).sum == users)
    assert(rows.last.getAs[Long]("cum_users") == users)
    val cums = rows.map(_.getAs[Long]("cum_users"))
    assert(cums.sameElements(cums.sorted))
  }

  test("q_ewma: smoother is bounded by the window's min/max count") {
    val rows = q("q_ewma").collect()
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
      val byDay = rs.sortBy(_.getAs[String]("day"))
      val ns = byDay.map(_.getAs[Long]("n").toDouble)
      byDay.zipWithIndex.foreach { case (r, i) =>
        val win = ns.slice(math.max(0, i - 9), i + 1)
        val e = r.getAs[Double]("ewma")
        assert(e >= win.min - 1e-4 && e <= win.max + 1e-4)
      }
    }
    // day 0 EWMA equals that day's count exactly
    rows.filter(_.getAs[String]("day") == "2024-01-01").foreach { r =>
      assert(r.getAs[Double]("ewma") == r.getAs[Long]("n").toDouble)
    }
  }

  test("q_wau: weekly actives bound daily actives and total users") {
    val rows = q("q_wau").collect()
    val dau = table("events")
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      .groupBy(date_format(col("d"), "yyyy-MM-dd").as("day"))
      .agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = table("events").select("user_id").distinct().count()
    rows.foreach { r =>
      val day = r.getAs[String]("day")
      val wau = r.getAs[Long]("wau")
      assert(wau >= dau(day), s"$day wau $wau < dau ${dau(day)}")
      assert(wau <= total)
    }
  }
}

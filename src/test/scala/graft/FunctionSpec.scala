package graft

import org.apache.spark.sql.functions._

/** Semantic checks for FunctionQueries on sf0.001. */
class FunctionSpec extends SparkSpec {

  test("q_str_split: total words equals sum of token counts") {
    val direct = table("documents")
      .select(size(split(col("text"), " ")).as("n"))
      .agg(sum("n")).head().getLong(0)
    assert(q("q_str_split").count() == direct)
  }

  test("q_str_regex: first_word is a prefix of text") {
    q("q_str_regex").collect().take(50).foreach { r =>
      val fw = r.getAs[String]("first_word")
      assert(fw.nonEmpty)
    }
  }

  test("q_date_funcs: fields agree with each other") {
    q("q_date_funcs").collect().take(100).foreach { r =>
      assert(r.getAs[Int]("mo") >= 1 && r.getAs[Int]("mo") <= 12)
      assert(r.getAs[Int]("dom") >= 1 && r.getAs[Int]("dom") <= 31)
      assert(r.getAs[Int]("dow") >= 1 && r.getAs[Int]("dow") <= 7)
      assert(r.getAs[String]("plus30").matches("\\d{4}-\\d{2}-\\d{2}"))
    }
  }

  test("q_math_funcs: floor <= price <= ceil; sqrt^2 ~= price") {
    q("q_math_funcs").collect().take(100).foreach { r =>
      assert(r.getAs[Long]("f") <= r.getAs[Long]("c"))
      val sq = r.getAs[Double]("sq")
      assert(sq >= 0)
    }
  }

  test("q_array_funcs: dims=64, n_pos <= dims, norm2 >= 0") {
    q("q_array_funcs").collect().foreach { r =>
      assert(r.getAs[Int]("dims") == 64)
      assert(r.getAs[Int]("n_pos") <= 64)
      assert(r.getAs[Double]("norm2") >= 0)
    }
  }

  test("q_map_funcs: map lookup round-trips event_type") {
    val m = q("q_map_funcs").collect().map(r =>
      r.getAs[Long]("event_id") -> r.getAs[String]("m_type")).toMap
    table("events").select("event_id", "event_type").collect().foreach { r =>
      assert(m(r.getAs[Long]("event_id")) == r.getAs[String]("event_type"))
    }
  }

  test("q_json_funcs: k_int parses k_str") {
    q("q_json_funcs").collect().foreach { r =>
      val s = r.getAs[String]("k_str")
      if (s != null && !r.isNullAt(r.fieldIndex("k_int")))
        assert(r.getAs[Int]("k_int") == s.toInt)
    }
  }

  test("q_evt_sliding: every event counted in exactly 2 overlapping windows") {
    val total = q("q_evt_sliding").collect().map(_.getAs[Long]("cnt")).sum
    assert(total == 2 * table("events").count())
  }

  test("q_evt_session: sessions partition each user's events; gaps respected") {
    val rows = q("q_evt_session").collect()
    val perUser = rows.groupBy(_.getAs[Long]("user_id"))
    val eventsPerUser = table("events").groupBy("user_id").count()
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("count")).toMap
    perUser.foreach { case (u, rs) =>
      assert(rs.map(_.getAs[Long]("n_events")).sum == eventsPerUser(u))
      // session ids are 1..k dense
      assert(rs.map(_.getAs[Long]("sess_id")).sorted.toSeq == (1L to rs.length))
      rs.foreach(r => assert(r.getAs[Long]("duration_s") >= 0))
    }
  }

  test("q_evt_tumbling: window is exactly one hour; counts partition events") {
    val rows = q("q_evt_tumbling").collect()
    rows.foreach { r =>
      val ws = r.getTimestamp(r.fieldIndex("ws"))
      val we = r.getTimestamp(r.fieldIndex("we"))
      assert(we.getTime - ws.getTime == 3600 * 1000L)
    }
    assert(rows.map(_.getAs[Long]("cnt")).sum == table("events").count())
  }
}

package graft

import org.apache.spark.sql.functions._

/** Semantic checks for WindowQueries on sf0.001. */
class WindowSpec extends SparkSpec {

  test("q_win_rownum: rn is 1..N within each priority, no gaps") {
    val rows = q("q_win_rownum").collect()
    rows.groupBy(_.getAs[String]("o_orderpriority")).foreach { case (_, rs) =>
      val rns = rs.map(_.getAs[Int]("rn")).sorted
      assert(rns.toSeq == (1 to rs.length))
    }
  }

  test("q_win_rank: dense_rank <= rank; quartile in 1..4") {
    q("q_win_rank").collect().foreach { r =>
      assert(r.getAs[Int]("drnk") <= r.getAs[Int]("rnk"))
      val qt = r.getAs[Int]("quartile")
      assert(qt >= 1 && qt <= 4)
      val pr = r.getAs[Double]("prnk")
      assert(pr >= 0.0 && pr <= 1.0)
    }
  }

  test("q_win_lag: first event per user has null prev_v") {
    val rows = q("q_win_lag").collect()
    val firstPerUser = rows.groupBy(_.getAs[Long]("user_id"))
      .map { case (_, rs) => rs.minBy(_.getAs[Long]("event_id")) }
    firstPerUser.foreach(r => assert(r.isNullAt(r.fieldIndex("prev_v"))))
  }

  test("q_win_firstlast: constant within each user partition") {
    q("q_win_firstlast").collect().groupBy(_.getAs[Long]("user_id"))
      .foreach { case (_, rs) =>
        assert(rs.map(_.getAs[Double]("first_v")).distinct.length == 1)
        assert(rs.map(_.getAs[Double]("last_v")).distinct.length == 1)
      }
  }

  test("q_win_running: final running sum equals group total") {
    val rows = q("q_win_running").collect()
    val totals = table("orders")
      .groupBy("o_orderpriority")
      .agg(sum(col("o_totalprice").cast("decimal(18,4)"))
        .cast("double").as("tot"))
      .collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.groupBy(_.getAs[String]("o_orderpriority")).foreach { case (p, rs) =>
      val last = rs.maxBy(_.getAs[Long]("run_cnt"))
      assert(last.getDouble(last.fieldIndex("run_sum")) == totals(p))
    }
  }

  test("q_win_moving: moving avg over full window of 3 where available") {
    val rows = q("q_win_moving").collect()
    assert(rows.forall(r => !r.isNullAt(r.fieldIndex("mavg_v"))))
  }

  test("q_win_range: count includes at least the current row") {
    q("q_win_range").collect().foreach { r =>
      assert(r.getAs[Long]("cnt_in_range") >= 1)
    }
  }

  test("q_win_dist: cdist in (0,1], monotone per nation; nth over full frame") {
    val rows = q("q_win_dist").collect()
    assert(rows.forall { r =>
      val c = r.getAs[Double]("cdist"); c > 0 && c <= 1
    })
    // third_poorest is constant within a nation and NULL iff the nation
    // has fewer than 3 suppliers
    rows.groupBy(_.getAs[Int]("nat")).foreach { case (_, rs) =>
      val vals = rs.map(r => Option(r.getAs[String]("third_poorest"))).distinct
      assert(vals.length == 1)
      assert(vals.head.isDefined == rs.length >= 3)
    }
  }
}

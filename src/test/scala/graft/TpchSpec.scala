package graft

import org.apache.spark.sql.functions._

/** Semantics of the round-3 TPC-H additions (Q1/Q6/Q18/Q19). The DuckDB
  * oracle hash-gates exact values at sf0.01; these specs pin the internal
  * invariants the oracle can't see (fixture assumptions, rewrite
  * equivalences, plan-level pre-filters).
  */
class TpchSpec extends SparkSpec {

  test("fixture invariant Q1/Q18 rely on: l_quantity is integral") {
    val bad = table("lineitem")
      .filter(col("l_quantity") =!= floor(col("l_quantity"))).count()
    assert(bad === 0L)
  }

  test("q_tpch_q1: six groups, counts partition the filtered scan") {
    val df = q("q_tpch_q1").cache()
    val n = table("lineitem")
      .filter(col("l_shipdate") <= lit("2001-09-02").cast("timestamp"))
      .count()
    assert(df.count() === 6)
    assert(df.agg(sum("count_order")).head().getLong(0) === n)
    df.unpersist()
  }

  test("q_tpch_q6: equals the naive filtered multiply-sum within 1e-6") {
    val expect = table("lineitem").collect().iterator.map { r =>
      val ship = r.getAs[java.time.LocalDateTime]("l_shipdate").toString
      val d = r.getAs[Double]("l_discount")
      val qn = r.getAs[Double]("l_quantity")
      if (ship >= "1997-01-01" && ship < "1998-01-01" &&
        d >= 0.05 && d <= 0.07 && qn < 24)
        BigDecimal(r.getAs[Double]("l_extendedprice") * d)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP)
      else BigDecimal(0)
    }.sum
    val got = q("q_tpch_q6").head().getDouble(0)
    assert(math.abs(got - expect.toDouble) < 1e-6)
  }

  test("q_tpch_q18: every reported order crosses the 300-qty threshold") {
    val rows = q("q_tpch_q18").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.forall(_.getAs[Long]("sum_qty") > 300))
    // totalprice is sorted descending with orderkey tiebreak
    val tp = rows.map(r => (-r.getAs[Double]("totalprice"),
      r.getAs[Long]("o_orderkey")))
    assert(tp.sameElements(tp.sorted))
  }

  test("q_tpch_q19: hand-hoisted part pre-filter changes nothing") {
    val unhoisted = table("lineitem")
      .join(table("part"), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30)))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(18,4)")).cast("double")).head().getDouble(0)
    assert(q("q_tpch_q19").head().getDouble(0) === unhoisted)
  }

  test("q_tpch_q19 plan: part scan carries the hoisted brand filter") {
    val plan = q("q_tpch_q19").queryExecution.optimizedPlan.toString
    assert(plan.contains("Brand#1") && plan.contains("p_brand"))
    // the brand IN pre-filter sits on the part relation, not only in the
    // post-join OR: the optimized plan has a Filter directly over part
    assert(plan.linesIterator.exists(l =>
      l.contains("p_brand") && l.contains("IN") || l.contains("isin")))
  }

  test("q_share_of_total: shares sum to 1 within each region and globally") {
    val rows = q("q_share_of_total").collect()
    assert(rows.length > 1)
    rows.groupBy(_.getAs[String]("r_name")).foreach { case (_, rs) =>
      val s = rs.map(_.getAs[Double]("region_share")).sum
      assert(math.abs(s - 1.0) < 1e-3, s"region shares sum $s")
    }
    val g = rows.map(_.getAs[Double]("global_share")).sum
    assert(math.abs(g - 1.0) < 1e-3, s"global shares sum $g")
  }

  test("q_tpch_q4: semi-join counts match a manual distinct-orderkey filter") {
    val expect = {
      val returned = table("lineitem")
        .filter(col("l_returnflag") === "R")
        .select("l_orderkey").distinct()
      table("orders")
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
        .join(returned, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    val got = q("q_tpch_q4").collect()
      .map(r => r.getString(0) -> r.getAs[Long]("order_count")).toMap
    assert(got == expect)
  }

  test("q_tpch_q7: both directions, years bounded, nations differ") {
    val rows = q("q_tpch_q7").collect()
    rows.foreach { r =>
      assert(r.getAs[String]("supp_nation") != r.getAs[String]("cust_nation"))
      val y = r.getAs[Int]("l_year")
      assert(y == 1997 || y == 1998)
      assert(r.getAs[Double]("revenue") > 0)
    }
  }

  test("q_tpch_q13: distribution covers every customer once") {
    val rows = q("q_tpch_q13").collect()
    val nCust = table("customer").count()
    assert(rows.map(_.getAs[Long]("custdist")).sum == nCust)
    // weighted count = total non-urgent orders
    val nOrd = table("orders")
      .filter(col("o_orderpriority") =!= "1-URGENT").count()
    assert(rows.map(r => r.getAs[Long]("c_count") * r.getAs[Long]("custdist"))
      .sum == nOrd)
  }

  test("q_tpch_q15: every reported supplier carries the same max revenue") {
    val rows = q("q_tpch_q15").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Double]("total_revenue")).distinct.length == 1)
  }

  test("q_tpch_q17: one scalar row") {
    assert(q("q_tpch_q17").collect().length == 1)
  }

  test("q_tpch_q22: flagged customers have no recent orders and high balance") {
    val rows = q("q_tpch_q22").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("numcust") > 0)
      assert(r.getAs[Double]("totacctbal") > 0)
    }
  }

  test("q_tpch_q8: market share is a proper fraction per year") {
    val rows = q("q_tpch_q8").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sh = r.getAs[Double]("mkt_share")
      assert(sh >= 0.0 && sh <= 1.0, s"share $sh")
    }
  }

  test("q_tpch_q14: promo share is a 0-100 percentage") {
    val rows = q("q_tpch_q14").collect()
    assert(rows.length == 1)
    if (!rows.head.isNullAt(0)) {
      val p = rows.head.getDouble(0)
      assert(p >= 0.0 && p <= 100.0)
    }
  }
}

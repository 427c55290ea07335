package graft.operators

import graft.QueryModule
import org.apache.spark.sql.functions._

/** SURVEY.md §2.3 L — TPC-H-shaped flagship analytics over the fixture
  * schema: the classic multi-way join + aggregate + top-k plans an OLAP
  * engine is judged on (the fixtures are TPC-H-ish per TESTDATA.md, so the
  * canonical queries apply nearly verbatim).
  *
  * Determinism: every revenue sum uses the dsum pattern (per-value
  * DECIMAL(18,4) cast → exact associative SUM → one final DOUBLE cast) so
  * partition order can't move a digit, and every ORDER BY carries a unique
  * tiebreaker so LIMIT cuts identically in both engines.
  *
  * Scale notes (the point of this module):
  *   - q_tpch_q3: customer (filtered by mktsegment) joins orders, then
  *     the orders×lineitem join shuffles on the shared orderkey; the
  *     aggregate is partial→final around one Exchange on the (already
  *     co-partitioned) orderkey. Top-10 is TakeOrderedAndProject — no
  *     global sort materialized.
  *   - q_tpch_q5: region→nation broadcast unconditionally (always tiny);
  *     customer and supplier get NO broadcast hint — Catalyst broadcasts
  *     them from size stats at fixture SFs but can fall back to shuffle
  *     joins at 100 TB, where both are fact-scale. The
  *     c_nationkey = s_nationkey predicate rides the supplier join as an
  *     extra equi-key, not a join explosion.
  *   - q_tpch_q10: one lineitem-side shuffle on orderkey, customer join on
  *     custkey, nation broadcast; top-20 again TakeOrderedAndProject.
  */
object TpchQueries extends QueryModule {

  private def dsum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast("decimal(18,4)")).cast("double")

  private val revenue = col("l_extendedprice") * (lit(1) - col("l_discount"))

  override def queries: Map[String, Q] = Map(
    // TPC-H Q3 (shipping priority): which un-shipped orders of one market
    // segment carry the most open revenue.
    "q_tpch_q3" -> ((s, dir) => {
      val cutoff = lit("1998-06-01").cast("timestamp")
      val cust = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
      // no broadcast() hint on customer: at fixture SFs Catalyst
      // auto-broadcasts it from size stats (PlanSpec asserts that); at
      // 100 TB customer is fact-scale and the hint would force a plan
      // that can't build — stats/AQE pick the shuffle join instead.
      cust.join(ord, col("c_custkey") === col("o_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(revenue).as("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5 (local supplier volume): revenue where customer and
    // supplier share a nation, per nation of one region.
    "q_tpch_q5" -> ((s, dir) => {
      val asiaNations = t(s, dir, "nation")
        .join(broadcast(t(s, dir, "region")
          .filter(col("r_name") === "ASIA").select("r_regionkey")),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      val supp = t(s, dir, "supplier")
        .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      val custOrd = ord.join(t(s, dir, "customer")
          .select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "c_nationkey")
      t(s, dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(custOrd, col("l_orderkey") === col("o_orderkey"))
        // supplier: broadcastable here, fact-scale at 100 TB — no hint,
        // stats/AQE decide (same reasoning as q_tpch_q3's customer side).
        .join(supp, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .groupBy("n_name")
        .agg(dsum(revenue).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // TPC-H Q10 (returned-item reporting): customers who returned the most
    // revenue in one quarter-ish window.
    "q_tpch_q10" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1999-07-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      val li = t(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
      val nat = t(s, dir, "nation").select("n_nationkey", "n_name")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer")
          .select("c_custkey", "c_name", "c_acctbal", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(revenue).as("revenue"))
        .select(col("c_custkey"), col("c_name"), col("revenue"),
          round(col("c_acctbal"), 4).as("acctbal"), col("n_name"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    "q_nation_summary" -> ((s, dir) => nationSummary(s, dir))
  )

  // Relational capstone: per-nation business summary — customer count,
  // exact-decimal revenue, returned-revenue share, and the top customer
  // by revenue (deterministic argmax: exact decimal ordering + custkey
  // tiebreak). Scale: nation broadcasts; the fact chain shuffles on its
  // natural keys; the window runs over the customer-grained aggregate
  // (not lineitem-grained), then collapses to 25 rows.
  private def nationSummary(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val drev = revenue.cast("decimal(18,4)")
    val cr = t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation").select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .join(t(s, dir, "orders").select("o_orderkey", "o_custkey"),
        col("o_custkey") === col("c_custkey"))
      .join(t(s, dir, "lineitem")
        .select("l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("n_name", "c_custkey")
      .agg(sum(drev).as("rev"),
        sum(when(col("l_returnflag") === "R", drev)
          .otherwise(lit(0).cast("decimal(18,4)"))).as("rev_r"))
    cr.withColumn("rn", row_number().over(
        Window.partitionBy("n_name")
          .orderBy(col("rev").desc, col("c_custkey"))))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_cust"),
        sum(col("rev")).cast("double").as("revenue"),
        pround4(sum(col("rev_r")).cast("double")
          / sum(col("rev")).cast("double")).as("ret_share"),
        max(when(col("rn") === 1, col("c_custkey"))).cast("bigint")
          .as("top_cust"))
      .orderBy("n_name")
  }

  override def oracleSql: Map[String, String] = Map(
    "q_tpch_q3" ->
      """SELECT l_orderkey,
        |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  o_orderdate, o_orderpriority
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-01'
        |  AND l_shipdate > TIMESTAMP '1998-06-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q_tpch_q5" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1999-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "q_tpch_q10" ->
      """SELECT c_custkey, c_name,
        |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  ROUND(c_acctbal, 4) AS acctbal, n_name
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1999-01-01'
        |  AND o_orderdate < TIMESTAMP '1999-07-01'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q_nation_summary" ->
      """WITH cr AS (
        |  SELECT n_name, c_custkey,
        |    SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS rev,
        |    SUM(CASE WHEN l_returnflag = 'R'
        |      THEN CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))
        |      ELSE CAST(0 AS DECIMAL(18,4)) END) AS rev_r
        |  FROM customer
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN orders ON o_custkey = c_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |  GROUP BY n_name, c_custkey),
        |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY n_name
        |    ORDER BY rev DESC, c_custkey) AS rn FROM cr)
        |SELECT n_name, COUNT(*) AS n_cust,
        |  CAST(SUM(rev) AS DOUBLE) AS revenue,
        |  FLOOR((CAST(SUM(rev_r) AS DOUBLE) / CAST(SUM(rev) AS DOUBLE))
        |    * 10000 + 0.5) / 10000 AS ret_share,
        |  CAST(MAX(CASE WHEN rn = 1 THEN c_custkey END) AS BIGINT) AS top_cust
        |FROM rk GROUP BY n_name ORDER BY n_name""".stripMargin
  )
}

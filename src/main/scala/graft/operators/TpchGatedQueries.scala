package graft.operators

import graft.QueryModule
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.3 L — the 7 TPC-H queries the driver fixtures cannot feed
  * yet (Q2, Q9, Q11, Q12, Q16, Q20, Q21: they need a `partsupp` table and
  * lineitem's l_shipmode / l_commitdate / l_receiptdate columns, absent
  * since round 1 — SURVEY.md §2.3's excluded list). The bodies and oracles
  * land NOW behind a fixture-presence gate: [[supported]] probes the
  * scale-factor directory, Verify dumps + registers these oracle entries
  * only when it returns true, so the moment the driver extends the
  * fixtures the driver's own DuckDB compare covers all 22 queries with no
  * builder action. Until then TpchGatedSpec runs them against a synthetic
  * extended fixture (built in-test) for real row-level coverage.
  *
  * Column adaptations (the fixtures carry no comment/address/mfgr
  * columns; substitutions keep both engines identical, so the oracle
  * contract is unaffected): Q2 returns p_brand for p_mfgr and omits
  * s_address/s_phone/s_comment; Q16's excluded-supplier predicate uses
  * s_acctbal < 0 for the spec's s_comment LIKE '%Customer%Complaints%';
  * Q20 returns s_acctbal for s_address. Nation parameters map the spec's
  * names onto the fixtures' synthetic ones (GERMANY→NATION_7,
  * CANADA→NATION_3, SAUDI ARABIA→NATION_20 — same convention as
  * TpchQueries' Q5/Q7/Q8). Deterministic total order: every query appends
  * a unique-key tiebreak to the spec's ORDER BY (the driver's compare is
  * row-order-sensitive).
  *
  * Scale notes: Q2/Q11/Q20's scalar/membership subqueries become
  * aggregate-then-join (min-cost per part, the 0.0001 threshold as a
  * one-row broadcast cross join, half-sum per (part, supplier)); Q21's
  * EXISTS / NOT EXISTS pair becomes semi/anti joins on l_orderkey —
  * Catalyst's native decorrelation shapes, all key-equality, no
  * cartesians. Q9/Q12 are plain star joins + aggregates riding partial
  * aggregation; every date/brand filter sits directly on the scan.
  */
object TpchGatedQueries extends QueryModule {

  /** Do the fixtures in `dir` carry the extended TPC-H surface? */
  def supported(spark: SparkSession, dir: String): Boolean = {
    val ps = new java.io.File(s"$dir/partsupp.parquet")
    ps.exists() && {
      val li = t(spark, dir, "lineitem").schema.fieldNames.map(_.toLowerCase)
      Seq("l_shipmode", "l_commitdate", "l_receiptdate")
        .forall(li.contains)
    }
  }

  private def ts(s: String) = lit(s).cast("timestamp")

  override def queries: Map[String, Q] = Map(
    // Q2: min-cost EUROPE supplier per STANDARD size-15 part. The
    // correlated MIN(ps_supplycost) subquery runs as one grouped
    // aggregate over the Europe-filtered partsupp, joined back on
    // (partkey, cost) — no per-row re-execution at any scale.
    "q_tpch_q2" -> ((s, dir) => {
      val euroCost = europePartsupp(s, dir)
      val minCost = euroCost.groupBy("ps_partkey")
        .agg(min("ps_supplycost").as("min_cost"))
      t(s, dir, "part")
        .filter(col("p_size") === 15 && col("p_type") === "STANDARD")
        .join(euroCost, col("p_partkey") === col("ps_partkey"))
        .join(minCost.withColumnRenamed("ps_partkey", "mc_partkey"),
          col("p_partkey") === col("mc_partkey") &&
            col("ps_supplycost") === col("min_cost"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("p_brand"), col("ps_supplycost"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey"))
        .limit(100)
    }),

    // Q9: profit by nation and order year over parts matching '%e%'.
    "q_tpch_q9" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val amount = li
        .join(t(s, dir, "part").filter(col("p_name").like("%e%"))
          .select("p_partkey"), col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "partsupp"),
          col("ps_partkey") === col("l_partkey") &&
            col("ps_suppkey") === col("l_suppkey"))
        .join(t(s, dir, "supplier").select("s_suppkey", "s_nationkey"),
          col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(t(s, dir, "nation").select("n_nationkey", "n_name")),
          col("n_nationkey") === col("s_nationkey"))
        .join(t(s, dir, "orders").select("o_orderkey", "o_orderdate"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("bigint").as("o_year"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))
            - col("ps_supplycost") * col("l_quantity")).as("amount"))
      amount.groupBy("nation", "o_year")
        .agg(round(sum("amount"), 4).as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    }),

    // Q11: GERMANY's important stock — value per part over a fraction of
    // the national total. The scalar threshold joins in as a one-row
    // broadcast, never a per-group re-aggregation.
    "q_tpch_q11" -> ((s, dir) => {
      val german = t(s, dir, "partsupp")
        .join(t(s, dir, "supplier").select("s_suppkey", "s_nationkey"),
          col("ps_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")
          .filter(col("n_name") === "NATION_7").select("n_nationkey")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("ps_partkey"),
          (col("ps_supplycost") * col("ps_availqty")).as("v"))
        .transform(graft.functions.Materialize(_)) // totals + per-part branches
      val threshold = german.agg((sum("v") * 0.0001).as("thresh"))
      german.groupBy("ps_partkey").agg(sum("v").as("value_raw"))
        .crossJoin(broadcast(threshold))
        .filter(col("value_raw") > col("thresh"))
        .select(col("ps_partkey"), round(col("value_raw"), 4).as("value"))
        .orderBy(col("value").desc, col("ps_partkey"))
    }),

    // Q12: late-shipment counts by ship mode for 1996 receipts.
    "q_tpch_q12" -> ((s, dir) => {
      val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      t(s, dir, "lineitem")
        .filter(col("l_shipmode").isin("MAIL", "SHIP") &&
          col("l_commitdate") < col("l_receiptdate") &&
          col("l_shipdate") < col("l_commitdate") &&
          col("l_receiptdate") >= ts("1996-01-01") &&
          col("l_receiptdate") < ts("1997-01-01"))
        .join(t(s, dir, "orders").select("o_orderkey", "o_orderpriority"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("l_shipmode")
        .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(hi, 0L).otherwise(1L)).as("low_line_count"))
        .orderBy("l_shipmode")
    }),

    // Q16: supplier counts per (brand, type, size) bucket, excluding
    // Brand#45 / MEDIUM types / negative-balance suppliers.
    "q_tpch_q16" -> ((s, dir) => {
      val excluded = t(s, dir, "supplier")
        .filter(col("s_acctbal") < 0).select("s_suppkey")
      t(s, dir, "partsupp")
        .join(t(s, dir, "part")
          .filter(col("p_brand") =!= "Brand#45" &&
            !col("p_type").like("MEDIUM%") &&
            col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)),
          col("p_partkey") === col("ps_partkey"))
        .join(excluded, col("ps_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct("ps_suppkey").as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    }),

    // Q20: CANADA suppliers holding excess 1996 stock of forest* parts.
    // The correlated half-sum subquery runs as one grouped aggregate over
    // 1996 lineitem, inner-joined back — replicating the spec's NULL
    // semantics (no shipments → no row → excluded).
    "q_tpch_q20" -> ((s, dir) => {
      val halfShipped = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01") &&
          col("l_shipdate") < ts("1997-01-01"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg((sum("l_quantity") * 0.5).as("half_qty"))
      val forestParts = t(s, dir, "part")
        .filter(col("p_name").like("forest%")).select("p_partkey")
      val stocked = t(s, dir, "partsupp")
        .join(forestParts, col("ps_partkey") === col("p_partkey"), "left_semi")
        .join(halfShipped, col("ps_partkey") === col("l_partkey") &&
          col("ps_suppkey") === col("l_suppkey"))
        .filter(col("ps_availqty") > col("half_qty"))
        .select("ps_suppkey").distinct()
      t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")
          .filter(col("n_name") === "NATION_3").select("n_nationkey")),
          col("s_nationkey") === col("n_nationkey"))
        .join(stocked, col("s_suppkey") === col("ps_suppkey"), "left_semi")
        .select(col("s_name"), col("s_acctbal"))
        .orderBy("s_name")
    }),

    // Q21: SAUDI ARABIA suppliers who alone blocked a multi-supplier 'F'
    // order — EXISTS as left-semi, NOT EXISTS as left-anti, both on
    // l_orderkey with the inequality predicates riding the join.
    "q_tpch_q21" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_receiptdate", "l_commitdate")
        .transform(graft.functions.Materialize(_)) // l1 + both exists probes
      val l1 = li.filter(col("l_receiptdate") > col("l_commitdate"))
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "F")
          .select("o_orderkey"), col("o_orderkey") === col("l_orderkey"),
          "left_semi")
      val l2 = li.select(col("l_orderkey").as("x_orderkey"),
        col("l_suppkey").as("x_suppkey"))
      val l3 = li.filter(col("l_receiptdate") > col("l_commitdate"))
        .select(col("l_orderkey").as("y_orderkey"),
          col("l_suppkey").as("y_suppkey"))
      l1
        .join(l2, col("x_orderkey") === col("l_orderkey") &&
          col("x_suppkey") =!= col("l_suppkey"), "left_semi")
        .join(l3, col("y_orderkey") === col("l_orderkey") &&
          col("y_suppkey") =!= col("l_suppkey"), "left_anti")
        .join(t(s, dir, "supplier").select("s_suppkey", "s_name", "s_nationkey"),
          col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(t(s, dir, "nation")
          .filter(col("n_name") === "NATION_20").select("n_nationkey")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy("s_name").agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    })
  )

  /** Europe-filtered partsupp with supplier/nation columns — shared by
    * Q2's outer block and its min-cost aggregate (one definition, so the
    * two sides can never drift). */
  private def europePartsupp(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "partsupp")
      .join(t(s, dir, "supplier"), col("ps_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region").filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .transform(graft.functions.Materialize(_))

  override def oracleSql: Map[String, String] = Map(
    "q_tpch_q2" ->
      """SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, ps_supplycost
        |FROM part, supplier, partsupp, nation, region
        |WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
        |  AND p_size = 15 AND p_type = 'STANDARD'
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'EUROPE'
        |  AND ps_supplycost = (
        |    SELECT MIN(ps_supplycost) FROM partsupp ps2, supplier s2,
        |      nation n2, region r2
        |    WHERE p_partkey = ps2.ps_partkey AND s2.s_suppkey = ps2.ps_suppkey
        |      AND s2.s_nationkey = n2.n_nationkey
        |      AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,

    "q_tpch_q9" ->
      """SELECT nation, o_year, ROUND(SUM(amount), 4) AS sum_profit FROM (
        |  SELECT n_name AS nation,
        |    CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
        |    l_extendedprice * (1 - l_discount)
        |      - ps_supplycost * l_quantity AS amount
        |  FROM part, supplier, lineitem, partsupp, orders, nation
        |  WHERE s_suppkey = l_suppkey AND ps_suppkey = l_suppkey
        |    AND ps_partkey = l_partkey AND p_partkey = l_partkey
        |    AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
        |    AND p_name LIKE '%e%') profit
        |GROUP BY nation, o_year
        |ORDER BY nation, o_year DESC""".stripMargin,

    "q_tpch_q11" ->
      """SELECT ps_partkey, ROUND(SUM(ps_supplycost * ps_availqty), 4) AS value
        |FROM partsupp, supplier, nation
        |WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |  AND n_name = 'NATION_7'
        |GROUP BY ps_partkey
        |HAVING SUM(ps_supplycost * ps_availqty) > (
        |  SELECT SUM(ps_supplycost * ps_availqty) * 0.0001
        |  FROM partsupp, supplier, nation
        |  WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |    AND n_name = 'NATION_7')
        |ORDER BY value DESC, ps_partkey""".stripMargin,

    "q_tpch_q12" ->
      """SELECT l_shipmode,
        |  SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END) AS high_line_count,
        |  SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 0 ELSE 1 END) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipmode IN ('MAIL', 'SHIP')
        |  AND l_commitdate < l_receiptdate AND l_shipdate < l_commitdate
        |  AND l_receiptdate >= TIMESTAMP '1996-01-01'
        |  AND l_receiptdate < TIMESTAMP '1997-01-01'
        |GROUP BY l_shipmode ORDER BY l_shipmode""".stripMargin,

    "q_tpch_q16" ->
      """SELECT p_brand, p_type, p_size,
        |  COUNT(DISTINCT ps_suppkey) AS supplier_cnt
        |FROM partsupp JOIN part ON p_partkey = ps_partkey
        |WHERE p_brand <> 'Brand#45' AND p_type NOT LIKE 'MEDIUM%'
        |  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
        |  AND ps_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q_tpch_q20" ->
      """SELECT s_name, s_acctbal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_3' AND s_suppkey IN (
        |  SELECT ps_suppkey FROM partsupp
        |  WHERE ps_partkey IN (
        |      SELECT p_partkey FROM part WHERE p_name LIKE 'forest%')
        |    AND ps_availqty > (
        |      SELECT 0.5 * SUM(l_quantity) FROM lineitem
        |      WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
        |        AND l_shipdate >= TIMESTAMP '1996-01-01'
        |        AND l_shipdate < TIMESTAMP '1997-01-01'))
        |ORDER BY s_name""".stripMargin,

    "q_tpch_q21" ->
      """SELECT s_name, COUNT(*) AS numwait
        |FROM supplier, lineitem l1, orders, nation
        |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F'
        |  AND l1.l_receiptdate > l1.l_commitdate
        |  AND EXISTS (SELECT * FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT * FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_receiptdate > l3.l_commitdate)
        |  AND s_nationkey = n_nationkey AND n_name = 'NATION_20'
        |GROUP BY s_name ORDER BY numwait DESC, s_name
        |LIMIT 100""".stripMargin
  )
}

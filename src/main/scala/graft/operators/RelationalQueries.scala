package graft.operators

import graft.QueryModule
import org.apache.spark.sql.functions._

/** SURVEY.md §2.3 A (scans), B (projection/filter/predicates),
  * F (sort/limit/top-k), G (set ops).
  *
  * Scale notes: every filter here is a plain Catalyst predicate on scan
  * columns, so it reaches the Parquet reader as a pushed filter (verified by
  * plan tests in RelationalSpec); projections prune the read schema. Sorts
  * are range-partitioned total sorts (Exchange rangepartitioning) — at 100 TB
  * these are only for deterministic result dumps, not engine-internal steps.
  * Top-k per group uses a window rank + filter: partial not possible, but AQE
  * coalesces the single hash partitioning by the group key.
  */
object RelationalQueries extends QueryModule {

  override def queries: Map[String, Q] = Map(
    // -- A. scans ---------------------------------------------------------
    "q_scan_parquet" -> ((s, dir) =>
      t(s, dir, "nation").orderBy("n_nationkey")),

    "q_scan_prune" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_quantity") > 45)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice"), 4).as("price"))
        // (l_orderkey, l_linenumber) is NOT unique in the fixture data —
        // order by every output column for determinism.
        .orderBy("l_orderkey", "l_linenumber", "price")),

    // -- B. projection / predicates --------------------------------------
    "q_project" -> ((s, dir) =>
      t(s, dir, "orders").select(
        col("o_orderkey"),
        upper(col("o_orderstatus")).as("status_u"),
        round(col("o_totalprice") * 0.1, 4).as("tithe"),
        year(col("o_orderdate")).as("oyear"))
        .orderBy("o_orderkey")),

    "q_filter_eq" -> ((s, dir) =>
      t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")),

    "q_filter_range" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter((col("l_quantity").between(10, 20) && col("l_discount") > 0.05)
          || col("l_tax") < 0.01)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_quantity"), 4).as("qty"),
          round(col("l_discount"), 4).as("disc"),
          round(col("l_tax"), 4).as("tax"))
        .orderBy("l_orderkey", "l_linenumber", "qty", "disc", "tax")),

    "q_filter_in" -> ((s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH")
          && !col("o_orderstatus").isin("P"))
        .select("o_orderkey", "o_orderpriority", "o_orderstatus")
        .orderBy("o_orderkey")),

    "q_filter_like" -> ((s, dir) =>
      t(s, dir, "part")
        .filter(col("p_type").like("PROMO%") && col("p_name").rlike("a.*e"))
        .select("p_partkey", "p_name", "p_type")
        .orderBy("p_partkey")),

    "q_filter_null" -> ((s, dir) =>
      t(s, dir, "customer")
        .withColumn("seg", nullif(col("c_mktsegment"), lit("BUILDING")))
        .filter(col("seg").isNull || col("c_acctbal") < 0)
        .select(col("c_custkey"), col("seg"),
          coalesce(col("seg"), lit("NONE")).as("seg_filled"),
          col("seg").eqNullSafe(lit("AUTOMOBILE")).as("nse"))
        .orderBy("c_custkey")),

    "q_case_when" -> ((s, dir) =>
      t(s, dir, "orders").select(
        col("o_orderkey"),
        when(col("o_totalprice") > 200000, "big")
          .when(col("o_totalprice") > 100000, "mid")
          .otherwise("small").as("bucket"))
        .orderBy("o_orderkey")),

    // -- F. sort / limit / top-k -----------------------------------------
    "q_sort_multi" -> ((s, dir) =>
      t(s, dir, "customer")
        .withColumn("seg_or_null", nullif(col("c_mktsegment"), lit("MACHINERY")))
        .select(col("c_custkey"), col("seg_or_null"),
          round(col("c_acctbal"), 4).as("bal"))
        .orderBy(col("seg_or_null").asc_nulls_first, col("bal").desc,
          col("c_custkey").asc)),

    "q_limit" -> ((s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"), round(col("o_totalprice"), 4).as("price"))
        .orderBy(col("price").desc, col("o_orderkey").asc)
        .limit(50)),

    "q_topk_group" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // Two-phase top-k: the group key has only 3 values, so a single
      // window would collapse parallelism to 3 tasks on the full table.
      // Phase 1 takes a local top-3 per (group, salt) — any global top-3
      // row is also top-3 in its salt bucket, so no candidate is lost —
      // then phase 2 ranks the ≤ 3×32 survivors. Result is identical to
      // the one-window form; at 100 TB this is the difference between 3
      // straggler tasks and full-cluster parallelism.
      val order = Seq(col("l_extendedprice").desc, col("l_orderkey").asc,
        col("l_linenumber").asc)
      val salt = pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(32))
      val wLocal = Window.partitionBy(col("l_returnflag"), salt)
        .orderBy(order: _*)
      val w = Window.partitionBy("l_returnflag").orderBy(order: _*)
      t(s, dir, "lineitem")
        .withColumn("rnl", row_number().over(wLocal))
        .filter(col("rnl") <= 3)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("l_returnflag"), col("rn"), col("l_orderkey"),
          col("l_linenumber"), round(col("l_extendedprice"), 4).as("price"))
        .orderBy("l_returnflag", "rn")
    }),

    // -- G. set operations ------------------------------------------------
    "q_union_all" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
        .unionAll(c.filter(col("c_acctbal") > 9000).select("c_custkey"))
        .orderBy("c_custkey")
    }),

    "q_union_distinct" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
        .union(c.filter(col("c_acctbal") > 9000).select("c_custkey"))
        .distinct()
        .orderBy("c_custkey")
    }),

    "q_intersect" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
        .intersect(c.filter(col("c_acctbal") > 5000).select("c_custkey"))
        .orderBy("c_custkey")
    }),

    "q_except" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
        .except(c.filter(col("c_acctbal") > 5000).select("c_custkey"))
        .orderBy("c_custkey")
    }),

    // The BAG (multiset) set-op variants: INTERSECT ALL keeps min(n_a,
    // n_b) copies per tuple, EXCEPT ALL keeps n_a - n_b — semantics the
    // DISTINCT forms above can't express. Both plan as an aggregate on
    // the tuple + count arithmetic (one shuffle per side), not a join
    // explosion; duplicate output rows are identical, so the driver's
    // row-sorted hash is order-safe.
    "q_intersect_all" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.filter(col("l_orderkey") % 2 === 0)
        .select("l_returnflag", "l_linestatus")
        .intersectAll(li.filter(col("l_orderkey") % 2 === 1)
          .select("l_returnflag", "l_linestatus"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "q_except_all" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.filter(col("l_orderkey") % 2 === 0)
        .select("l_returnflag", "l_linestatus")
        .exceptAll(li.filter(col("l_orderkey") % 2 === 1)
          .select("l_returnflag", "l_linestatus"))
        .orderBy("l_returnflag", "l_linestatus")
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "q_scan_parquet" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",

    "q_scan_prune" ->
      """SELECT l_orderkey, l_linenumber, ROUND(l_extendedprice, 4) AS price
        |FROM lineitem WHERE l_quantity > 45
        |ORDER BY l_orderkey, l_linenumber, price""".stripMargin,

    "q_project" ->
      """SELECT o_orderkey, UPPER(o_orderstatus) AS status_u,
        |       ROUND(o_totalprice * 0.1, 4) AS tithe,
        |       CAST(YEAR(o_orderdate) AS INTEGER) AS oyear
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_filter_eq" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE c_mktsegment = 'BUILDING' ORDER BY c_custkey""".stripMargin,

    "q_filter_range" ->
      """SELECT l_orderkey, l_linenumber, ROUND(l_quantity, 4) AS qty,
        |       ROUND(l_discount, 4) AS disc, ROUND(l_tax, 4) AS tax
        |FROM lineitem
        |WHERE (l_quantity BETWEEN 10 AND 20 AND l_discount > 0.05)
        |   OR l_tax < 0.01
        |ORDER BY l_orderkey, l_linenumber, qty, disc, tax""".stripMargin,

    "q_filter_in" ->
      """SELECT o_orderkey, o_orderpriority, o_orderstatus FROM orders
        |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        |  AND o_orderstatus NOT IN ('P')
        |ORDER BY o_orderkey""".stripMargin,

    "q_filter_like" ->
      """SELECT p_partkey, p_name, p_type FROM part
        |WHERE p_type LIKE 'PROMO%' AND regexp_matches(p_name, 'a.*e')
        |ORDER BY p_partkey""".stripMargin,

    "q_filter_null" ->
      """SELECT c_custkey, NULLIF(c_mktsegment, 'BUILDING') AS seg,
        |       COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'NONE') AS seg_filled,
        |       NULLIF(c_mktsegment, 'BUILDING') IS NOT DISTINCT FROM 'AUTOMOBILE' AS nse
        |FROM customer
        |WHERE NULLIF(c_mktsegment, 'BUILDING') IS NULL OR c_acctbal < 0
        |ORDER BY c_custkey""".stripMargin,

    "q_case_when" ->
      """SELECT o_orderkey,
        |       CASE WHEN o_totalprice > 200000 THEN 'big'
        |            WHEN o_totalprice > 100000 THEN 'mid'
        |            ELSE 'small' END AS bucket
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_sort_multi" ->
      """SELECT c_custkey, NULLIF(c_mktsegment, 'MACHINERY') AS seg_or_null,
        |       ROUND(c_acctbal, 4) AS bal
        |FROM customer
        |ORDER BY seg_or_null ASC NULLS FIRST, bal DESC, c_custkey ASC""".stripMargin,

    "q_limit" ->
      """SELECT o_orderkey, ROUND(o_totalprice, 4) AS price FROM orders
        |ORDER BY price DESC, o_orderkey ASC LIMIT 50""".stripMargin,

    "q_topk_group" ->
      """SELECT l_returnflag, rn, l_orderkey, l_linenumber, price FROM (
        |  SELECT l_returnflag, l_orderkey, l_linenumber,
        |         ROUND(l_extendedprice, 4) AS price,
        |         ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |             ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        |  FROM lineitem)
        |WHERE rn <= 3 ORDER BY l_returnflag, rn""".stripMargin,

    "q_union_all" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |UNION ALL
        |SELECT c_custkey FROM customer WHERE c_acctbal > 9000
        |ORDER BY c_custkey""".stripMargin,

    "q_union_distinct" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |UNION
        |SELECT c_custkey FROM customer WHERE c_acctbal > 9000
        |ORDER BY c_custkey""".stripMargin,

    "q_intersect" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |INTERSECT
        |SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        |ORDER BY c_custkey""".stripMargin,

    "q_except" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |EXCEPT
        |SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        |ORDER BY c_custkey""".stripMargin,

    "q_intersect_all" ->
      """SELECT l_returnflag, l_linestatus FROM lineitem
        |  WHERE l_orderkey % 2 = 0
        |INTERSECT ALL
        |SELECT l_returnflag, l_linestatus FROM lineitem
        |  WHERE l_orderkey % 2 = 1
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_except_all" ->
      """SELECT l_returnflag, l_linestatus FROM lineitem
        |  WHERE l_orderkey % 2 = 0
        |EXCEPT ALL
        |SELECT l_returnflag, l_linestatus FROM lineitem
        |  WHERE l_orderkey % 2 = 1
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}

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
  *   - q_tpch_q1: the canonical scan-heavy aggregate — no join at all, 8
  *     aggregates over one filtered scan collapsing to 6 groups. Partial
  *     aggregation does ~all the work map-side; the Exchange carries 6
  *     rows × 8 buffers per partition regardless of corpus size.
  *   - q_tpch_q6: filter-and-sum to ONE row; every predicate reaches the
  *     parquet scan (shipdate/discount/quantity are all scan columns), so
  *     at 100 TB this is I/O-bound on pruned row groups, nothing else.
  *   - q_tpch_q18: the HAVING subquery is computed ONCE as a groupBy and
  *     joined back on orderkey (not re-scanned per row as the literal SQL
  *     suggests); qty sums are exact BIGINT. The orderkey aggregate and
  *     the orders join share a key, so AQE can co-partition them.
  *   - q_tpch_q19: the part-side conjuncts implied by the OR branches
  *     (brand ∈ {1,2,3}, size ≤ 15) are hoisted to the part scan by hand —
  *     Catalyst doesn't factor OR-common predicates out, and at 100 TB
  *     that pre-filter is the difference between joining 3 brands' parts
  *     and joining the whole part table.
  *   - q_tpch_q7/q8: the nation/region dims broadcast unconditionally;
  *     the selective filters (two nations, one part type, one region)
  *     cut each fact input BEFORE its wide join, so the join chain's
  *     shuffles carry the filtered stream only.
  *   - q_tpch_q13: left join preserves the zero-order bucket; both
  *     aggregations are key-grained (custkey, then the tiny count
  *     domain) — the second one is alphabet-bounded.
  *   - q_tpch_q15: the revenue relation is one suppkey-grained aggregate
  *     reused for both the scalar max and the argmax join (the max
  *     broadcasts back; no second scan). Exact-decimal max → the argmax
  *     SET is deterministic with no tiebreak needed.
  *   - q_tpch_q17: per-part average joined back (never a correlated
  *     re-scan); brand pre-filter broadcasts, so only that brand's lines
  *     ever aggregate.
  *   - q_tpch_q22: the positive-balance average is a 1-row broadcast;
  *     "no recent orders" is a LEFT ANTI join on custkey (the distinct
  *     shrinks the probe side before the anti-join shuffle).
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

    "q_nation_summary" -> ((s, dir) => nationSummary(s, dir)),

    // TPC-H Q1 (pricing summary report): the scan-dominated aggregate.
    // l_quantity is integral in the fixtures (asserted in TpchSpec) so its
    // sums ride exact BIGINT; price sums use dsum; the three averages are
    // ratio-of-exact-sums under the portable round. sum_charge CANNOT use
    // dsum: the triple product e·(1-d)·(1+t) lands near .00005 half-ties
    // often enough (~400/58k fixture rows) to expose that Spark's
    // double→decimal cast rounds the shortest-repr decimal HALF_UP while
    // DuckDB rints the scaled binary double — so the per-row 4-decimal
    // fix is done with the pround4 op sequence (floor(x·10⁴+0.5), exact
    // in both engines), summed as BIGINT, divided once at the end.
    "q_tpch_q1" -> ((s, dir) => {
      val disc = col("l_extendedprice") * (lit(1) - col("l_discount"))
      val charge = disc * (lit(1) + col("l_tax"))
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("bigint")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(disc).as("sum_disc_price"),
          (sum(floor(charge * 10000 + lit(0.5)).cast("bigint"))
            .cast("double") / 10000).as("sum_charge"),
          pround4(sum(col("l_quantity").cast("bigint")).cast("double")
            / count(lit(1))).as("avg_qty"),
          pround4(dsum(col("l_extendedprice")) / count(lit(1)))
            .as("avg_price"),
          pround4(sum(col("l_discount").cast("decimal(18,4)"))
            .cast("double") / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // TPC-H Q6 (forecasting revenue change): pure filter-and-sum; the
    // global agg on a possibly-empty relation yields one NULL row in both
    // engines.
    "q_tpch_q6" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(dsum(col("l_extendedprice") * col("l_discount"))
          .as("revenue"))),

    // TPC-H Q18 (large-volume customers): orders whose total quantity
    // crosses a threshold, reported with their customer. The HAVING
    // relation is one orderkey-grained aggregate reused by the join — not
    // the correlated re-scan the canonical SQL text implies.
    "q_tpch_q18" -> ((s, dir) => {
      val big = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast("bigint")).as("sum_qty"))
        .filter(col("sum_qty") > 300)
      big.join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), round(col("o_totalprice"), 4).as("totalprice"),
          col("sum_qty"))
        .orderBy(col("totalprice").desc, col("o_orderkey"))
        .limit(20)
    }),

    // TPC-H Q7 (volume shipping): revenue flowing between two specific
    // nations (supplier side × customer side, both directions), by ship
    // year. Both nation dims broadcast; the orders⋈lineitem chain
    // shuffles once on orderkey, customer on custkey — the supplier and
    // customer nation filters cut the fact stream before the wide joins.
    "q_tpch_q7" -> ((s, dir) => {
      val nat = broadcast(t(s, dir, "nation")
        .filter(col("n_name").isin("NATION_2", "NATION_3"))
        .select("n_nationkey", "n_name"))
      val supp = t(s, dir, "supplier")
        .join(nat, col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cust = t(s, dir, "customer")
        .join(nat, col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1999-01-01").cast("timestamp"))
        .join(supp, col("l_suppkey") === col("s_suppkey"))
        .join(t(s, dir, "orders").select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(dsum(revenue).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // TPC-H Q13 (customer distribution): how many customers placed k
    // non-urgent orders, INCLUDING the zero-order bucket the left join
    // preserves — the canonical histogram-of-a-count pattern.
    "q_tpch_q13" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .select("o_orderkey", "o_custkey")
      t(s, dir, "customer").select("c_custkey")
        .join(ord, col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // TPC-H Q15 (top supplier): suppliers achieving the MAXIMUM quarterly
    // revenue — max over an exact-decimal aggregate, so the argmax set is
    // deterministic without a tiebreak. The revenue relation is computed
    // once; the scalar max broadcasts back onto it.
    "q_tpch_q15" -> ((s, dir) => {
      val drev = revenue.cast("decimal(18,4)")
      val rev = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1999-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1999-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(sum(drev).as("total_rev"))
      val top = rev.agg(max(col("total_rev")).as("max_rev"))
      rev.join(broadcast(top), col("total_rev") === col("max_rev"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("total_rev").cast("double").as("total_revenue"))
        .orderBy("s_suppkey")
    }),

    // TPC-H Q17 (small-quantity-order revenue): lines of one brand whose
    // quantity is below 20% of that part's average quantity. The per-part
    // average is a groupBy joined back (not a correlated re-scan); the
    // 0.2·avg threshold is the same double op sequence in both engines.
    "q_tpch_q17" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice")
      val brand = t(s, dir, "part")
        .filter(col("p_brand") === "Brand#5").select("p_partkey")
      val bl = li.join(broadcast(brand), col("l_partkey") === col("p_partkey"))
      val avgq = bl.groupBy(col("p_partkey").as("ap"))
        .agg((sum(col("l_quantity")) / count(lit(1))).as("avg_qty"))
      bl.join(avgq, col("p_partkey") === col("ap"))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg(pround4(dsum(col("l_extendedprice")) / 7.0).as("avg_yearly"))
    }),

    // TPC-H Q8 (national market share): one nation's share of EUROPE's
    // ECONOMY-part import revenue, per order year. Shares are ratios of
    // exact decimal sums; the case-split rides the supplier-nation dim.
    "q_tpch_q8" -> ((s, dir) => {
      val drev = revenue.cast("decimal(18,4)")
      val europeCust = t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")
          .join(broadcast(t(s, dir, "region")
            .filter(col("r_name") === "EUROPE").select("r_regionkey")),
            col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey")),
          col("c_nationkey") === col("n_nationkey"))
        .select("c_custkey")
      val econParts = t(s, dir, "part")
        .filter(col("p_type") === "ECONOMY").select("p_partkey")
      val suppNat = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey").as("sn_key"),
            col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("sn_key"))
        .select("s_suppkey", "supp_nation")
      t(s, dir, "lineitem")
        .join(broadcast(econParts), col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
          .select("o_orderkey", "o_custkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .join(europeCust, col("o_custkey") === col("c_custkey"))
        .join(suppNat, col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(pround4(
          sum(when(col("supp_nation") === "NATION_2", revenue)
            .otherwise(lit(0.0)).cast("decimal(18,4)")).cast("double")
            / sum(drev).cast("double")).as("mkt_share"))
        .orderBy("o_year")
    }),

    // TPC-H Q14 (promotion effect): PROMO-part share of one month's
    // revenue, as a 0-100 percentage of exact decimal sums.
    "q_tpch_q14" -> ((s, dir) => {
      val drev = revenue.cast("decimal(18,4)")
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1999-03-01").cast("timestamp") &&
          col("l_shipdate") < lit("1999-04-01").cast("timestamp"))
        .join(broadcast(t(s, dir, "part").select("p_partkey", "p_type")),
          col("l_partkey") === col("p_partkey"))
        .agg(pround4(lit(100.0)
          * sum(when(col("p_type") === "PROMO", revenue)
            .otherwise(lit(0.0)).cast("decimal(18,4)")).cast("double")
          / sum(drev).cast("double")).as("promo_revenue"))
    }),

    // TPC-H Q22 (global sales opportunity): well-funded customers with no
    // recent orders, bucketed by market segment (the fixture stand-in for
    // the phone country code). The positive-balance average is a 1-row
    // broadcast; the "no recent orders" test is a LEFT ANTI join.
    "q_tpch_q22" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val avgBal = cust.filter(col("c_acctbal") > 0)
        .agg((dsum(col("c_acctbal")) / count(lit(1))).as("avg_bal"))
      val recent = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
        .select("o_custkey").distinct()
      cust.crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("numcust"),
          dsum(col("c_acctbal")).as("totacctbal"))
        .orderBy("c_mktsegment")
    }),

    // Percent-of-parent analytics: each nation's revenue as a share of
    // its region and of the world — the standard drill-down ratio view.
    // Shares divide exact decimal sums (cast to double only for the one
    // final division); the windows run over the 25-row nation aggregate,
    // never over fact rows.
    "q_share_of_total" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val drev = revenue.cast("decimal(18,4)")
      val nr = t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .join(t(s, dir, "orders").select("o_orderkey", "o_custkey"),
          col("o_custkey") === col("c_custkey"))
        .join(t(s, dir, "lineitem")
          .select("l_orderkey", "l_extendedprice", "l_discount"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("r_name", "n_name")
        .agg(sum(drev).as("nrev"))
      val wr = Window.partitionBy("r_name")
      val wg = Window.partitionBy()
      nr.select(col("r_name"), col("n_name"),
          col("nrev").cast("double").as("revenue"),
          pround4(col("nrev").cast("double")
            / sum(col("nrev")).over(wr).cast("double")).as("region_share"),
          pround4(col("nrev").cast("double")
            / sum(col("nrev")).over(wg).cast("double")).as("global_share"))
        .orderBy("r_name", "n_name")
    }),

    // TPC-H Q4 (order-priority checking), adapted to the fixture schema:
    // the reference predicate (commitdate < receiptdate) has no fixture
    // column, so the EXISTS probes for a returned line instead. The
    // subquery is a LEFT SEMI join — one pass over lineitem, no distinct
    // materialized, orderkey-keyed shuffle on both sides.
    "q_tpch_q4" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
      val returned = t(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R").select("l_orderkey")
      ord.join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),

    // TPC-H Q19 (discounted revenue, OR'd brand/size/quantity branches).
    // The part-only implications of the OR (brand ∈ {…}, size bound) are
    // hoisted onto the part scan — see the module scale notes.
    "q_tpch_q19" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      val p = t(s, dir, "part")
        .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3") &&
          col("p_size") >= 1 && col("p_size") <= 15)
        .select("p_partkey", "p_brand", "p_size")
      li.join(p, col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 30)))
        .agg(dsum(revenue).as("revenue"))
    })
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
        |FROM rk GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*(1+l_tax) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000 AS sum_charge,
        |  FLOOR((CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*))
        |    * 10000 + 0.5) / 10000 AS avg_qty,
        |  FLOOR((CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*))
        |    * 10000 + 0.5) / 10000 AS avg_price,
        |  FLOOR((CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*))
        |    * 10000 + 0.5) / 10000 AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2001-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_tpch_q6" ->
      """SELECT CAST(SUM(CAST(l_extendedprice*l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q_tpch_q18" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING SUM(CAST(l_quantity AS BIGINT)) > 300)
        |SELECT c_name, c_custkey, o_orderkey, o_orderdate,
        |  ROUND(o_totalprice, 4) AS totalprice, sum_qty
        |FROM big
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY totalprice DESC, o_orderkey LIMIT 20""".stripMargin,

    "q_tpch_q7" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(YEAR(l_shipdate) AS INT) AS l_year,
        |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE n1.n_name IN ('NATION_2', 'NATION_3')
        |  AND n2.n_name IN ('NATION_2', 'NATION_3')
        |  AND n1.n_name <> n2.n_name
        |  AND l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1999-01-01'
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    "q_tpch_q13" ->
      """WITH co AS (SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |    AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |SELECT c_count, COUNT(*) AS custdist
        |FROM co GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q_tpch_q15" ->
      """WITH rev AS (SELECT l_suppkey,
        |    SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4)))
        |      AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1999-01-01'
        |    AND l_shipdate < TIMESTAMP '1999-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    "q_tpch_q17" ->
      """WITH bl AS (SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#5'),
        |a AS (SELECT l_partkey AS ap, SUM(l_quantity) / COUNT(*) AS avg_qty
        |  FROM bl GROUP BY l_partkey)
        |SELECT FLOOR((CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
        |    AS DOUBLE) / 7.0) * 10000 + 0.5) / 10000 AS avg_yearly
        |FROM bl JOIN a ON l_partkey = ap
        |WHERE l_quantity < CAST(0.2 AS DOUBLE) * avg_qty""".stripMargin,

    "q_tpch_q8" ->
      """SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year,
        |  FLOOR((CAST(SUM(CASE WHEN n1.n_name = 'NATION_2'
        |        THEN CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))
        |        ELSE CAST(0.0 AS DECIMAL(18,4)) END) AS DOUBLE)
        |    / CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE))
        |    * 10000 + 0.5) / 10000 AS mkt_share
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |JOIN region ON n2.n_regionkey = r_regionkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |WHERE p_type = 'ECONOMY' AND r_name = 'EUROPE'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1999-01-01'
        |GROUP BY o_year ORDER BY o_year""".stripMargin,

    "q_tpch_q14" ->
      """SELECT FLOOR((CAST(100.0 AS DOUBLE)
        |    * CAST(SUM(CASE WHEN p_type = 'PROMO'
        |        THEN CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))
        |        ELSE CAST(0.0 AS DECIMAL(18,4)) END) AS DOUBLE)
        |    / CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE))
        |    * 10000 + 0.5) / 10000 AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1999-03-01'
        |  AND l_shipdate < TIMESTAMP '1999-04-01'""".stripMargin,

    "q_tpch_q22" ->
      """WITH ab AS (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4)))
        |      AS DOUBLE) / COUNT(*) AS avg_bal
        |  FROM customer WHERE c_acctbal > 0)
        |SELECT c_mktsegment, COUNT(*) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
        |    AS totacctbal
        |FROM customer CROSS JOIN ab
        |WHERE c_acctbal > avg_bal
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey
        |      AND o_orderdate >= TIMESTAMP '1999-01-01')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_share_of_total" ->
      """WITH nr AS (SELECT r_name, n_name,
        |    SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4)))
        |      AS nrev
        |  FROM customer
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  JOIN orders ON o_custkey = c_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |  GROUP BY r_name, n_name)
        |SELECT r_name, n_name, CAST(nrev AS DOUBLE) AS revenue,
        |  FLOOR(CAST(nrev AS DOUBLE)
        |    / CAST(SUM(nrev) OVER (PARTITION BY r_name) AS DOUBLE)
        |    * 10000 + 0.5) / 10000 AS region_share,
        |  FLOOR(CAST(nrev AS DOUBLE) / CAST(SUM(nrev) OVER () AS DOUBLE)
        |    * 10000 + 0.5) / 10000 AS global_share
        |FROM nr ORDER BY r_name, n_name""".stripMargin,

    "q_tpch_q4" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_tpch_q19" ->
      """SELECT CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin
  )
}

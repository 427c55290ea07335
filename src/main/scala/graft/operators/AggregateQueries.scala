package graft.operators

import graft.QueryModule
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.3 D — aggregation family.
  *
  * Determinism strategy (the survey's §2.3 ROUND rule, hardened):
  *   - SUM/AVG over doubles are NOT order-deterministic at scale (Spark sums
  *     in partition order; at sf0.1 the float error can cross a ROUND(...,4)
  *     boundary). So every additive aggregate first casts each VALUE to
  *     DECIMAL(18,4) — per-value rounding is order-free — and sums exactly.
  *     Decimal addition is associative, so any partition order (and any
  *     number of executors at 100 TB) yields the same digits.
  *   - AVG = exact decimal SUM cast to double, divided by COUNT — one
  *     deterministic float division instead of an order-dependent mean.
  *   - Variance/stddev/corr keep double math (no exact form) but their
  *     error is ~1e-12 relative; ROUND(...,4) absorbs it.
  *   - grouping flags are CAST to INT on both sides (Spark emits TINYINT,
  *     DuckDB BIGINT) and lead every ORDER BY so subtotal rows order
  *     identically; NULLS FIRST is explicit (DuckDB defaults nulls-last).
  *
  * Scale notes: all grouped aggregates here are hash aggregates with
  * map-side partial aggregation (HashAggregate partial→final around one
  * Exchange on the group key) — the plan that survives 100 TB. COUNT
  * DISTINCT expands to a two-phase Expand + aggregate; rollup/cube use
  * Expand (row multiplication ×(levels)) before the same partial/final
  * split, so no extra shuffles vs a plain groupBy.
  */
object AggregateQueries extends QueryModule {

  /** Exact, order-independent sum: per-value DECIMAL(18,4) cast, then SUM.
    * The FINAL output is cast to DOUBLE: the accumulation stays exact and
    * associative (any partition order yields the same digits), and equal
    * decimals convert to bit-identical doubles in both engines. Emitting
    * DECIMAL itself would break the driver's exact-hash gate — its pandas
    * bridge lowers DuckDB DECIMAL results to float64 while Spark parquet
    * carries Decimal objects (equal values, different bytes). */
  private def dsum(c: Column): Column =
    sum(c.cast("decimal(18,4)")).cast("double")

  /** Deterministic mean: exact decimal sum → one double division →
    * portable round (a scale-4 sum over a 2-5-smooth group count can land
    * exactly on a half-tie; see QueryModule.pround4). */
  private def davg(c: Column): Column =
    pround4(sum(c.cast("decimal(18,4)")).cast("double") / count(lit(1)))

  override def queries: Map[String, Q] = Map(
    "q_agg_global" -> ((s, dir) =>
      t(s, dir, "lineitem").agg(
        count(lit(1)).as("cnt"),
        dsum(col("l_quantity")).as("sum_qty"),
        round(min(col("l_extendedprice")), 4).as("min_price"),
        round(max(col("l_extendedprice")), 4).as("max_price"),
        davg(col("l_discount")).as("avg_disc"))),

    // TPC-H Q1 shape: partial agg on 32 input partitions, one Exchange on
    // the 2-column group key (6 groups), final agg — the canonical 100 TB
    // aggregate plan.
    "q_agg_group" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "l_linestatus")),

    "q_agg_having" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("sum_price"))
        .filter(col("cnt") >= 12)
        .orderBy("o_custkey")),

    "q_agg_distinct" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).as("d_parts"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag")),

    // Multiple distincts → Catalyst Expand (one row per distinct column) +
    // two-phase aggregate; still a single shuffle.
    "q_agg_multi_distinct" -> ((s, dir) =>
      t(s, dir, "lineitem").agg(
        countDistinct(col("l_partkey")).as("d_parts"),
        countDistinct(col("l_suppkey")).as("d_supps"),
        countDistinct(col("l_returnflag"), col("l_linestatus")).as("d_fs"),
        count(lit(1)).as("cnt"))),

    "q_agg_rollup" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
          grouping(col("l_returnflag")).cast("int").as("g_rf"),
          grouping(col("l_linestatus")).cast("int").as("g_ls"),
          count(lit(1)).as("cnt"),
          dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("g_rf"), col("g_ls"),
          col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)),

    "q_agg_cube" -> ((s, dir) =>
      t(s, dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
          grouping(col("o_orderstatus")).cast("int").as("g_st"),
          grouping(col("o_orderpriority")).cast("int").as("g_pr"),
          count(lit(1)).as("cnt"),
          dsum(col("o_totalprice")).as("sum_price"))
        .orderBy(col("g_st"), col("g_pr"),
          col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)),

    // Explicit GROUPING SETS via SQL (survey §2.3: "SQL GROUP BY GROUPING
    // SETS") — exercises the SQL front-end path of the engine too.
    "q_agg_gsets" -> ((s, dir) => {
      t(s, dir, "events").createOrReplaceTempView("events")
      s.sql("""
        SELECT event_type, user_id,
               CAST(GROUPING(event_type) AS INT) AS g_et,
               CAST(GROUPING(user_id) AS INT) AS g_uid,
               COUNT(*) AS cnt,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_v
        FROM events
        GROUP BY GROUPING SETS ((event_type, user_id), (event_type), ())
        ORDER BY g_et, g_uid,
                 event_type ASC NULLS FIRST, user_id ASC NULLS FIRST""")
    }),

    // NULL-key grouping parity — both engines must treat NULL as ONE
    // group (not drop it, not one-group-per-null): the null group is
    // synthesized with NULLIF so the fixture's non-null columns still
    // exercise the trap. COALESCE/NULLIF also land in the output surface.
    "q_null_group" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(expr("NULLIF(l_returnflag, 'N')").as("flag"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("l_linestatus")).as("n_status"))
        .select(col("flag"),
          coalesce(col("flag"), lit("(none)")).as("label"),
          col("n"), col("n_status"))
        .orderBy("label")),

    // Exact percentile (not approx) so DuckDB quantile_cont matches.
    "q_agg_stats" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
          round(var_samp(col("l_quantity")), 4).as("var_qty"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 4)
            .as("corr_qp"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4)
            .as("cov_qp"),
          round(expr("percentile(l_quantity, 0.5)"), 4).as("med_qty"))
        .orderBy("l_returnflag")),

    // Exact quartiles over QUANTIZED values (price → integer cents): with
    // integer operands and quarter-exact interpolation fractions (p ∈
    // {.25,.5,.75} × integer n-1), the lerp is exact in double regardless
    // of either engine's op order — no half-tie can ever form. This is the
    // portable pattern for exact percentiles over continuous data; for
    // 100 TB use approx_percentile (t-digest sketch, tested in
    // CoverageSpec) — exact percentile is a full sort per group.
    "q_percentile" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .select(col("l_returnflag"),
          floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long")
            .as("cents"))
        .groupBy("l_returnflag")
        .agg(
          pround4(expr("percentile(cents, 0.25D)")).as("p25"),
          pround4(expr("percentile(cents, 0.5D)")).as("p50"),
          pround4(expr("percentile(cents, 0.75D)")).as("p75"))
        .orderBy("l_returnflag")),

    // Equi-depth histogram: NTILE(8) buckets of price cents per return
    // flag with per-bucket bounds — the optimizer-statistics /
    // distribution-sketch builder (equi-depth bounds are what a cost
    // model keeps). The ORDER BY carries the unique (orderkey,
    // linenumber) tiebreak so both engines split ties identically (the
    // q_rfm discipline). Round 13: the flag-partitioned window put ~⅓
    // of FACT-grain lineitem through one task (3 distinct flags);
    // RangeRank.withGroupedRank range-partitions on (flag, cents,
    // tiebreak) and ranks per (partition, flag) — every window task
    // holds a contiguous slice, and NTILE(8) is the integer formula
    // over (per-flag rank, per-flag count). Hash-identical to the
    // window NTILE because the per-flag order is total.
    "q_hist_equidepth" -> ((s, dir) => {
      import graft.functions.RangeRank
      val rows = t(s, dir, "lineitem")
        .select(col("l_returnflag"),
          floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long")
            .as("cents"),
          col("l_orderkey"), col("l_linenumber"))
      val ranked = RangeRank.withGroupedRank(rows, Seq("l_returnflag"),
        Seq(col("cents"), col("l_orderkey"), col("l_linenumber")), "__rk",
        countName = "__nf")
      ranked
        .withColumn("bucket",
          RangeRank.ntileFromRank(col("__rk"), col("__nf"), 8).cast("int"))
        .groupBy("l_returnflag", "bucket")
        .agg(count(lit(1)).as("n"),
          min(col("cents")).as("lo"), max(col("cents")).as("hi"))
        .orderBy("l_returnflag", "bucket")
    }),

    // collect_list/collect_set are only deterministic once sorted; arrays
    // stay small (bounded by group size) — at 100 TB this operator is only
    // safe on bounded-cardinality groups, which is the contract here.
    // Outputs are '|'-serialized: the driver's comparator lex-sorts rows by
    // every column and array cells are unsortable/unhashable in pandas.
    "q_agg_collect" -> ((s, dir) =>
      t(s, dir, "customer")
        .groupBy("c_nationkey")
        .agg(
          array_join(array_sort(collect_list(col("c_name"))), "|").as("names"),
          array_join(array_sort(collect_set(col("c_mktsegment"))), "|").as("segs"),
          count(lit(1)).as("cnt"))
        .orderBy("c_nationkey")),

    // Conditional aggregates — the FILTER (WHERE …) clause surface:
    // count_if / filtered dsum / bool_and / bool_or. All four stay inside
    // one partial→final HashAggregate (the predicate is evaluated map-side,
    // so filtered rows never widen the shuffle). A group with no matching
    // rows yields NULL for the filtered sum on both engines.
    "q_agg_filter" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
          count_if(col("o_totalprice") > 150000).as("n_big"),
          sum(when(col("o_orderstatus") === "O",
              col("o_totalprice").cast("decimal(18,4)")))
            .cast("double").as("rev_open"),
          bool_and(col("o_totalprice") > lit(0)).as("all_pos"),
          bool_or(col("o_orderstatus") === "F").as("any_final"))
        .orderBy("o_orderpriority")),

    // listagg … WITHIN GROUP (ORDER BY …) — the ANSI ordered string
    // aggregate (Spark 4 ListAgg). The (nationkey, segment) pairs are
    // DISTINCT'd FIRST (partial→final aggregate, 125 rows out), so the
    // string is bounded by segment cardinality (5) no matter the group
    // size — the only listagg shape that is safe at 100 TB. (listagg's own
    // DISTINCT modifier trips a SortOrder cast bug in Spark 4.1 ListAgg,
    // and would also carry every raw row into the sort buffer.)
    // The materialized-rollup rewrite (plans/RollupRewrite) under the
    // DRIVER'S oracle gate: register a (returnflag, linestatus) partial-
    // aggregate rollup, run a SUBSET-grouping aggregate — the rule
    // rewrites it to re-aggregate the rollup (RollupSpec asserts the plan
    // substitution; executed eagerly here via Materialize so the rewrite
    // fires inside this function, then the registry is cleared so no
    // other query's plan is touched) — and hash-match the plain SQL the
    // oracle runs on the raw table. A rewrite bug (wrong partial fold,
    // dropped group, count/sum mix-up) lands here as a hash mismatch.
    "q_rollup_rewrite" -> ((s, dir) => {
      val fact = t(s, dir, "lineitem")
      graft.plans.RollupRewrite.clear()
      graft.plans.RollupRewrite.register(fact,
        groupCols = Seq("l_returnflag", "l_linestatus"),
        sumCols = Seq("l_linenumber", "l_orderkey"),
        minCols = Seq("l_partkey"), maxCols = Seq("l_partkey"))
      val agg = fact.groupBy("l_returnflag")
        .agg(sum("l_linenumber").as("s_line"),
          sum("l_orderkey").as("s_okey"),
          count(lit(1)).as("n"),
          min("l_partkey").as("mn_part"),
          max("l_partkey").as("mx_part"))
        .orderBy("l_returnflag")
      val out = graft.functions.Materialize(agg)
      graft.plans.RollupRewrite.clear()
      out
    }),

    "q_listagg" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("customer")
      s.sql(
        """WITH pairs AS (
          |  SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
          |)
          |SELECT c_nationkey,
          |  listagg(c_mktsegment, '|')
          |    WITHIN GROUP (ORDER BY c_mktsegment) AS segs,
          |  COUNT(*) AS n_segs
          |FROM pairs GROUP BY c_nationkey
          |ORDER BY c_nationkey""".stripMargin)
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "q_rollup_rewrite" ->
      """SELECT l_returnflag,
        |  CAST(SUM(l_linenumber) AS BIGINT) AS s_line,
        |  CAST(SUM(l_orderkey) AS BIGINT) AS s_okey,
        |  COUNT(*) AS n,
        |  MIN(l_partkey) AS mn_part,
        |  MAX(l_partkey) AS mx_part
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q_listagg" ->
      """WITH pairs AS (
        |  SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
        |)
        |SELECT c_nationkey,
        |  string_agg(c_mktsegment, '|' ORDER BY c_mktsegment) AS segs,
        |  COUNT(*) AS n_segs
        |FROM pairs GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin,

    "q_agg_filter" ->
      """SELECT o_orderpriority,
        |  COUNT(*) FILTER (WHERE o_totalprice > 150000) AS n_big,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
        |       FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS rev_open,
        |  BOOL_AND(o_totalprice > 0) AS all_pos,
        |  BOOL_OR(o_orderstatus = 'F') AS any_final
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q_agg_global" ->
      """SELECT COUNT(*) AS cnt,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  ROUND(MIN(l_extendedprice), 4) AS min_price,
        |  ROUND(MAX(l_extendedprice), 4) AS max_price,
        |  FLOOR((CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)) * 10000 + 0.5) / 10000 AS avg_disc
        |FROM lineitem""".stripMargin,

    "q_agg_group" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  FLOOR((CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)) * 10000 + 0.5) / 10000 AS avg_qty,
        |  COUNT(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_agg_having" ->
      """SELECT o_custkey, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 12
        |ORDER BY o_custkey""".stripMargin,

    "q_agg_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS d_parts, COUNT(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_agg_multi_distinct" ->
      """SELECT COUNT(DISTINCT l_partkey) AS d_parts,
        |       COUNT(DISTINCT l_suppkey) AS d_supps,
        |       COUNT(DISTINCT (l_returnflag, l_linestatus)) AS d_fs,
        |       COUNT(*) AS cnt
        |FROM lineitem""".stripMargin,

    "q_agg_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
        |  CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
        |  COUNT(*) AS cnt,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY g_rf, g_ls, l_returnflag ASC NULLS FIRST,
        |         l_linestatus ASC NULLS FIRST""".stripMargin,

    "q_agg_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(GROUPING(o_orderstatus) AS INT) AS g_st,
        |  CAST(GROUPING(o_orderpriority) AS INT) AS g_pr,
        |  COUNT(*) AS cnt,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY g_st, g_pr, o_orderstatus ASC NULLS FIRST,
        |         o_orderpriority ASC NULLS FIRST""".stripMargin,

    "q_agg_gsets" ->
      """SELECT event_type, user_id,
        |  CAST(GROUPING(event_type) AS INT) AS g_et,
        |  CAST(GROUPING(user_id) AS INT) AS g_uid,
        |  COUNT(*) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_v
        |FROM events
        |GROUP BY GROUPING SETS ((event_type, user_id), (event_type), ())
        |ORDER BY g_et, g_uid,
        |         event_type ASC NULLS FIRST, user_id ASC NULLS FIRST""".stripMargin,

    "q_null_group" ->
      """SELECT NULLIF(l_returnflag, 'N') AS flag,
        |  COALESCE(NULLIF(l_returnflag, 'N'), '(none)') AS label,
        |  COUNT(*) AS n,
        |  COUNT(DISTINCT l_linestatus) AS n_status
        |FROM lineitem
        |GROUP BY NULLIF(l_returnflag, 'N')
        |ORDER BY label""".stripMargin,

    "q_agg_stats" ->
      """SELECT l_returnflag,
        |  ROUND(STDDEV_SAMP(l_quantity), 4) AS sd_qty,
        |  ROUND(VAR_SAMP(l_quantity), 4) AS var_qty,
        |  ROUND(CORR(l_quantity, l_extendedprice), 4) AS corr_qp,
        |  ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 4) AS cov_qp,
        |  ROUND(QUANTILE_CONT(l_quantity, 0.5), 4) AS med_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_percentile" ->
      """SELECT l_returnflag,
        |  FLOOR(QUANTILE_CONT(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT), 0.25) * 10000 + 0.5) / 10000 AS p25,
        |  FLOOR(QUANTILE_CONT(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT), 0.50) * 10000 + 0.5) / 10000 AS p50,
        |  FLOOR(QUANTILE_CONT(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT), 0.75) * 10000 + 0.5) / 10000 AS p75
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_hist_equidepth" ->
      """WITH b AS (
        |  SELECT l_returnflag,
        |    CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
        |    NTILE(8) OVER (PARTITION BY l_returnflag
        |      ORDER BY CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT),
        |        l_orderkey, l_linenumber) AS bucket
        |  FROM lineitem)
        |SELECT l_returnflag, bucket, COUNT(*) AS n,
        |  MIN(cents) AS lo, MAX(cents) AS hi
        |FROM b GROUP BY l_returnflag, bucket
        |ORDER BY l_returnflag, bucket""".stripMargin,

    "q_agg_collect" ->
      """SELECT c_nationkey,
        |  LIST_AGGREGATE(LIST_SORT(LIST(c_name)), 'string_agg', '|') AS names,
        |  LIST_AGGREGATE(LIST_SORT(LIST(DISTINCT c_mktsegment)), 'string_agg', '|') AS segs,
        |  COUNT(*) AS cnt
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin
  )
}

package graft.operators

import graft.QueryModule
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.3 M — the statistical-testing family: the hypothesis
  * tests and effect measures an analytics engine runs AFTER the
  * aggregates (q_ab_test started this family; these complete it):
  *
  *   - q_ks_test: two-sample Kolmogorov-Smirnov D for every source
  *     pair over the n_chars distribution — "are these two sources
  *     drawn from the same length distribution?" (the nonparametric
  *     companion to q_psi_drift's binned score).
  *   - q_chisq: lang × source chi-square independence test — does
  *     source predict language?
  *   - q_mutual_info: the same contingency table's mutual information
  *     in bits — the effect-size view of that dependence.
  *   - q_mean_ci: per-language mean document length with a 95%
  *     confidence half-width (the error bar every dashboard needs).
  *   - q_pareto_8020: revenue concentration — the smallest customer
  *     prefix covering 80% of revenue (the 80/20 audit).
  *
  * Determinism:
  *   - KS compares SCALED-INTEGER cumulative gaps: |ca·nb − cb·na| is
  *     exact BIGINT arithmetic, so the max and the final single
  *     division are engine-identical; the CDF grid is the union
  *     support, built per source with one ordered window.
  *   - Chi-square and MI terms are doubles with a pinned op order
  *     (expected counts from exact BIGINT row·col products) and are
  *     scaled to BIGINTs before the order-sensitive SUM.
  *   - The Pareto crossing is found with the integer inequality
  *     5·cum ≥ 4·total — no 0.8 literal, no float compare.
  *
  * Scale notes (100 TB lens): every query reduces the corpus to a
  * KB-sized statistic relation in ONE aggregate pass (per-(source,
  * value) counts — support-bounded; lang × source cells —
  * alphabet-bounded; per-customer revenue — entity-grained) and runs
  * the test arithmetic on that. The KS support grid is |support| ×
  * |sources| rows; the Pareto ranking windows over customers, two-phase
  * range ranks at cluster scale.
  */
object StatsQueries extends QueryModule {

  override def queries: Map[String, Q] = Map(
    // All-pairs two-sample KS over n_chars: D = max_v |F1(v) − F2(v)|.
    "q_ks_test" -> ((s, dir) => {
      val cnt = graft.functions.Materialize(
        t(s, dir, "documents")
          .groupBy(col("source"), col("n_chars").as("v"))
          .agg(count(lit(1)).as("c")))
      val grid = cnt.select("source").distinct()
        .crossJoin(cnt.select("v").distinct())
      val cum = grid.join(cnt, Seq("source", "v"), "left")
        .withColumn("cc", sum(coalesce(col("c"), lit(0L)))
          .over(Window.partitionBy("source").orderBy("v")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("n", sum(coalesce(col("c"), lit(0L)))
          .over(Window.partitionBy("source")))
        .select(col("source"), col("v"), col("cc"), col("n"))
      val a = cum.select(col("source").as("s1"), col("v"),
        col("cc").as("ca"), col("n").as("na"))
      val b = cum.select(col("source").as("s2"), col("v").as("v2"),
        col("cc").as("cb"), col("n").as("nb"))
      a.join(b, col("v") === col("v2") && col("s1") < col("s2"))
        .groupBy("s1", "s2")
        .agg(max(col("na")).as("n1"), max(col("nb")).as("n2"),
          max(abs(col("ca") * col("nb") - col("cb") * col("na")))
            .as("dint"))
        .select(col("s1"), col("s2"), col("n1"), col("n2"),
          pround4(col("dint").cast("double") / (col("n1") * col("n2")))
            .as("d_stat"))
        .orderBy("s1", "s2")
    }),

    // Chi-square independence of the lang × source contingency table.
    "q_chisq" -> ((s, dir) => {
      val o = graft.functions.Materialize(
        t(s, dir, "documents").groupBy("lang", "source")
          .agg(count(lit(1)).as("o")))
      val row = o.groupBy("lang").agg(sum(col("o")).as("rn"))
      val colm = o.groupBy("source").agg(sum(col("o")).as("cn"))
      val tot = o.agg(sum(col("o")).as("tot"),
        countDistinct(col("lang")).as("nl"),
        countDistinct(col("source")).as("ns"))
      // dense grid: zero cells still contribute (o − e)²/e = e
      val grid = row.crossJoin(colm).crossJoin(broadcast(tot))
      val terms = grid
        .join(o, Seq("lang", "source"), "left")
        .select(col("nl"), col("ns"), col("tot"),
          coalesce(col("o"), lit(0L)).as("o"),
          ((col("rn") * col("cn")).cast("double") / col("tot")).as("e"))
        .select(col("nl"), col("ns"), col("tot"),
          floor((col("o").cast("double") - col("e")) *
            (col("o").cast("double") - col("e")) / col("e") * lit(1e10)
            + lit(0.5)).cast("bigint").as("ti"))
      terms.groupBy("nl", "ns", "tot")
        .agg(sum(col("ti")).as("sti"))
        .select(col("tot").as("n_docs"),
          ((col("nl") - 1) * (col("ns") - 1)).as("df"),
          pround4(col("sti").cast("double") / lit(1e10)).as("chi2"))
    }),

    // Mutual information (bits) of the same contingency table.
    "q_mutual_info" -> ((s, dir) => {
      val o = graft.functions.Materialize(
        t(s, dir, "documents").groupBy("lang", "source")
          .agg(count(lit(1)).as("o")))
      val row = o.groupBy("lang").agg(sum(col("o")).as("rn"))
      val colm = o.groupBy("source").agg(sum(col("o")).as("cn"))
      val tot = o.agg(sum(col("o")).as("tot"), count(lit(1)).as("cells"))
      o.join(row, Seq("lang")).join(colm, Seq("source"))
        .crossJoin(broadcast(tot))
        .select(col("tot"), col("cells"),
          floor(col("o").cast("double") / col("tot") *
            log2((col("o") * col("tot")).cast("double") /
              (col("rn") * col("cn")).cast("double")) * lit(1e12)
            + lit(0.5)).cast("bigint").as("ti"))
        .groupBy("tot", "cells")
        .agg(sum(col("ti")).as("sti"))
        .select(col("tot").as("n_docs"), col("cells").as("n_cells"),
          pround4(col("sti").cast("double") / lit(1e12)).as("mi_bits"))
    }),

    // Per-language mean length ± 95% CI half-width.
    "q_mean_ci" -> ((s, dir) =>
      t(s, dir, "documents")
        .groupBy("lang")
        .agg(count(lit(1)).as("n"),
          pround4(sum(col("n_chars").cast("long")).cast("double")
            / count(lit(1))).as("mean_chars"),
          pround4(lit(1.96) * stddev_samp(col("n_chars")) /
            sqrt(count(lit(1)).cast("double"))).as("ci95"))
        .orderBy("lang")),

    // 80/20 revenue concentration: smallest customer prefix (revenue
    // desc, custkey tiebreak) whose cumulative revenue clears 80%.
    // Round 13: the global row_number + running sum + partitionBy(lit(1))
    // totals all funneled the customer grain through ONE window task;
    // now RangeRank's two-phase pass gives the rank AND the integer-
    // exact running sum (per-range prefix sums + broadcast offsets),
    // totals come from a broadcast global aggregate, and the crossing
    // row is a TakeOrderedAndProject (sort fused into limit 1).
    "q_pareto_8020" -> ((s, dir) => {
      import graft.functions.RangeRank
      // pin the customer-revenue aggregate once: the boundary, totals,
      // offsets and rank passes all read it (re-running the orders
      // aggregation per pass would cost more than the 1-row-per-customer
      // checkpoint)
      val crev = graft.functions.Materialize(t(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
          .as("cents")))
      val totals = crev.agg(sum(col("cents")).as("t"),
        count(lit(1)).as("nc"))
      val ranked = RangeRank.withGroupedRank(crev, Nil,
          Seq(col("cents").desc, col("o_custkey")), "rnk",
          sumCols = Seq("cents" -> "cum"))
        .crossJoin(broadcast(totals))
      ranked.filter(col("cum") * 5 >= col("t") * 4)
        .orderBy("rnk").limit(1) // the crossing row
        .select(col("nc").as("n_cust"), col("rnk").as("n80"),
          pround4(col("rnk").cast("double") / col("nc")).as("cust_share"),
          pround4(col("cum").cast("double") / col("t")).as("rev_share"))
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "q_ks_test" ->
      s"""WITH cnt AS (
         |  SELECT source, n_chars AS v, COUNT(*) AS c
         |  FROM documents GROUP BY source, n_chars),
         |grid AS (
         |  SELECT s.source, u.v
         |  FROM (SELECT DISTINCT source FROM cnt) s
         |  CROSS JOIN (SELECT DISTINCT v FROM cnt) u),
         |cum AS (
         |  SELECT g.source, g.v,
         |    SUM(COALESCE(c, 0)) OVER (PARTITION BY g.source ORDER BY g.v
         |      ROWS UNBOUNDED PRECEDING) AS cc,
         |    SUM(COALESCE(c, 0)) OVER (PARTITION BY g.source) AS n
         |  FROM grid g LEFT JOIN cnt ON g.source = cnt.source AND g.v = cnt.v)
         |SELECT a.source AS s1, b.source AS s2,
         |  CAST(MAX(a.n) AS BIGINT) AS n1, CAST(MAX(b.n) AS BIGINT) AS n2,
         |  ${sqlRound4(
             "CAST(MAX(ABS(a.cc * b.n - b.cc * a.n)) AS DOUBLE) / " +
             "(MAX(a.n) * MAX(b.n))")} AS d_stat
         |FROM cum a JOIN cum b ON a.v = b.v AND a.source < b.source
         |GROUP BY a.source, b.source ORDER BY s1, s2""".stripMargin,

    "q_chisq" ->
      s"""WITH o AS (SELECT lang, source, COUNT(*) AS o
         |  FROM documents GROUP BY lang, source),
         |r AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS rn
         |  FROM o GROUP BY lang),
         |c AS (SELECT source, CAST(SUM(o) AS BIGINT) AS cn
         |  FROM o GROUP BY source),
         |t AS (SELECT CAST(SUM(o) AS BIGINT) AS tot,
         |    COUNT(DISTINCT lang) AS nl, COUNT(DISTINCT source) AS ns
         |  FROM o),
         |grid AS (SELECT lang, source, rn, cn FROM r CROSS JOIN c),
         |terms AS (
         |  SELECT t.nl, t.ns, t.tot,
         |    CAST(FLOOR((CAST(COALESCE(o.o, 0) AS DOUBLE) -
         |        CAST(g.rn * g.cn AS DOUBLE) / t.tot) *
         |      (CAST(COALESCE(o.o, 0) AS DOUBLE) -
         |        CAST(g.rn * g.cn AS DOUBLE) / t.tot) /
         |      (CAST(g.rn * g.cn AS DOUBLE) / t.tot) * 1e10 + 0.5)
         |      AS BIGINT) AS ti
         |  FROM grid g
         |  LEFT JOIN o ON g.lang = o.lang AND g.source = o.source
         |  CROSS JOIN t)
         |SELECT MAX(tot) AS n_docs,
         |  CAST((MAX(nl) - 1) * (MAX(ns) - 1) AS BIGINT) AS df,
         |  ${sqlRound4("CAST(SUM(ti) AS DOUBLE) / 1e10")} AS chi2
         |FROM terms""".stripMargin,

    "q_mutual_info" ->
      s"""WITH o AS (SELECT lang, source, COUNT(*) AS o
         |  FROM documents GROUP BY lang, source),
         |r AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS rn
         |  FROM o GROUP BY lang),
         |c AS (SELECT source, CAST(SUM(o) AS BIGINT) AS cn
         |  FROM o GROUP BY source),
         |t AS (SELECT CAST(SUM(o) AS BIGINT) AS tot, COUNT(*) AS cells
         |  FROM o),
         |terms AS (
         |  SELECT t.tot, t.cells,
         |    CAST(FLOOR(CAST(o.o AS DOUBLE) / t.tot *
         |      LOG2(CAST(o.o * t.tot AS DOUBLE) /
         |        CAST(r.rn * c.cn AS DOUBLE)) * 1e12 + 0.5) AS BIGINT)
         |      AS ti
         |  FROM o JOIN r ON o.lang = r.lang
         |  JOIN c ON o.source = c.source CROSS JOIN t)
         |SELECT MAX(tot) AS n_docs, CAST(MAX(cells) AS BIGINT) AS n_cells,
         |  ${sqlRound4("CAST(SUM(ti) AS DOUBLE) / 1e12")} AS mi_bits
         |FROM terms""".stripMargin,

    "q_mean_ci" ->
      s"""SELECT lang, COUNT(*) AS n,
         |  ${sqlRound4(
             "CAST(SUM(CAST(n_chars AS BIGINT)) AS DOUBLE) / COUNT(*)")}
         |    AS mean_chars,
         |  ${sqlRound4(
             "1.96 * STDDEV_SAMP(n_chars) / SQRT(CAST(COUNT(*) AS DOUBLE))")}
         |    AS ci95
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q_pareto_8020" ->
      s"""WITH crev AS (
         |  SELECT o_custkey,
         |    CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
         |      AS BIGINT) AS cents
         |  FROM orders GROUP BY o_custkey),
         |rk AS (
         |  SELECT o_custkey, cents,
         |    ROW_NUMBER() OVER (ORDER BY cents DESC, o_custkey) AS rnk,
         |    CAST(SUM(cents) OVER (ORDER BY cents DESC, o_custkey
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         |    CAST(SUM(cents) OVER () AS BIGINT) AS t,
         |    COUNT(*) OVER () AS nc
         |  FROM crev),
         |hit AS (SELECT * FROM rk WHERE cum * 5 >= t * 4),
         |fst AS (SELECT * FROM hit
         |  WHERE rnk = (SELECT MIN(rnk) FROM hit))
         |SELECT CAST(nc AS BIGINT) AS n_cust, CAST(rnk AS BIGINT) AS n80,
         |  ${sqlRound4("CAST(rnk AS DOUBLE) / nc")} AS cust_share,
         |  ${sqlRound4("CAST(cum AS DOUBLE) / t")} AS rev_share
         |FROM fst""".stripMargin
  )
}

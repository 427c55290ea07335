package graft.operators

import graft.QueryModule
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.3 M — data-governance + curation-planning operators: the
  * queries a dataset steward runs before RELEASING aggregates or
  * committing a training mix:
  *
  *   - q_dp_counts: ε=1 differentially-private (lang, source) counts —
  *     Laplace(1) noise drawn DETERMINISTICALLY per group from the
  *     inverse CDF of a 48-bit md5 uniform, so the release is
  *     reproducible (a fixed-seed DP release: same data → same noise,
  *     which is how a pipeline re-run avoids paying ε twice). True count
  *     kept alongside as the audit column; a production release exports
  *     only the noisy one.
  *   - q_k_anon: k-anonymity audit (k = 5) over the quasi-identifier
  *     (lang, source, length-centile-bucket): per language, how many
  *     quasi-groups are re-identification risks (n < k) and what row
  *     share they carry — the release-gate metric.
  *   - q_mix_knapsack: greedy fractional-knapsack source-mix plan —
  *     rank sources by NOVELTY DENSITY (first-occurrence 3-gram shingles
  *     per character, q_novelty's attribution) and include them until
  *     half the corpus char budget is spent. The "which sources earn
  *     their tokens" planner: a source of near-duplicates ranks last no
  *     matter its size.
  *
  * Determinism: Laplace noise is −sign(d)·ln(1−2|d|) with d = u−½ and
  * u = (2·hv+1)/2⁴⁹ — dividend odd-integer-exact, divisor a power of
  * two, so u is bit-identical cross-engine and ln/sign follow the same
  * IEEE sequence (q_log_odds precedent). The knapsack crossing uses the
  * integer test 2·(cum − chars) < total — no 0.5 literal. min_by/ARG_MIN
  * tie-break on the UNIQUE doc_id, so first-source attribution is total.
  *
  * Scale notes (100 TB lens):
  *   - q_dp_counts/q_k_anon noise/audit KB-sized aggregate relations —
  *     the corpus is touched once by a partial-agg count.
  *   - q_mix_knapsack's heavy side is the distinct (doc, shingle) pass —
  *     MinHashDedup's shuffle grain; the ranking window runs on the
  *     |sources|-row rollup.
  */
object GovernanceQueries extends QueryModule {

  override def queries: Map[String, Q] = Map(
    // ε=1 DP release of (lang, source) counts, deterministic Laplace.
    "q_dp_counts" -> ((s, dir) => {
      val g = t(s, dir, "documents")
        .groupBy("lang", "source").agg(count(lit(1)).as("n"))
      g.select(col("lang"), col("source"), col("n"),
        {
          val u = ((hv48(concat(col("lang"), lit("|"), col("source"))) * 2
            + 1).cast("double") / lit(562949953421312.0)) // 2^49
          val d = u - lit(0.5)
          pround4(col("n") + (-signum(d)) * log(lit(1.0) - lit(2.0) * abs(d)))
        }.as("n_noisy"))
        .orderBy("lang", "source")
    }),

    // k-anonymity audit over (lang, source, length bucket), k = 5.
    "q_k_anon" -> ((s, dir) => {
      val g = t(s, dir, "documents")
        .select(col("lang"), col("source"),
          floor(col("n_chars") / 100).as("lb"))
        .groupBy("lang", "source", "lb").agg(count(lit(1)).as("n"))
      g.groupBy("lang")
        .agg(count(lit(1)).as("n_groups"),
          count_if(col("n") < 5).as("n_risky"),
          sum(col("n")).as("n_rows"),
          sum(when(col("n") < 5, col("n")).otherwise(0L)).as("risky_rows"))
        .select(col("lang"), col("n_groups"), col("n_risky"), col("n_rows"),
          pround4(col("risky_rows").cast("double") / col("n_rows"))
            .as("risk_share"))
        .orderBy("lang")
    }),

    // Greedy novelty-density source mix under a 50% char budget.
    "q_mix_knapsack" -> ((s, dir) => {
      // the write-once GramStore artifact replaces the per-query inline
      // shingle derivation (round-11; this query's from-scratch oracle
      // proves stored ≡ derived on every sweep)
      // BUCKETED read (round-12): the groupBy sh runs exchange-free
      val sh = graft.functions.GramStore.shingles3Bucketed(s, dir)
        .select("doc_id", "source", "sh")
      // each shingle's novelty credit goes to the source of its FIRST doc
      val nv = sh.groupBy("sh")
        .agg(min_by(col("source"), col("doc_id")).as("source"))
        .groupBy("source").agg(count(lit(1)).as("nv"))
      val chars = t(s, dir, "documents")
        .groupBy("source").agg(sum(col("n_chars")).as("chars"))
      val ranked = chars.join(nv, Seq("source"), "left")
        .select(col("source"), col("chars"),
          coalesce(col("nv"), lit(0L)).as("nv"))
        .withColumn("density",
          col("nv").cast("double") / col("chars"))
      val w = Window.orderBy(col("density").desc, col("source"))
      ranked
        .withColumn("rnk", row_number().over(w))
        .withColumn("cum", sum(col("chars")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("tot", sum(col("chars")).over(Window.partitionBy(lit(1))))
        .select(col("rnk"), col("source"), col("nv"), col("chars"),
          pround4(col("density")).as("density"),
          when((col("cum") - col("chars")) * 2 < col("tot"), 1)
            .otherwise(0).as("included"))
        .orderBy("rnk")
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "q_dp_counts" -> {
      val hex12 = sqlHv48("h")
      s"""WITH g AS (
         |  SELECT lang, source, COUNT(*) AS n,
         |    md5(lang || '|' || source) AS h
         |  FROM documents GROUP BY lang, source),
         |u AS (
         |  SELECT lang, source, n,
         |    (($hex12) * 2 + 1) / 562949953421312.0 - 0.5 AS d
         |  FROM g)
         |SELECT lang, source, n,
         |  ${sqlRound4("n + (-SIGN(d)) * LN(1.0 - 2.0 * ABS(d))")} AS n_noisy
         |FROM u ORDER BY lang, source""".stripMargin
    },

    "q_k_anon" ->
      s"""WITH g AS (
         |  SELECT lang, source, CAST(FLOOR(n_chars / 100.0) AS BIGINT) AS lb,
         |    COUNT(*) AS n
         |  FROM documents GROUP BY lang, source, lb)
         |SELECT lang, COUNT(*) AS n_groups,
         |  COUNT(*) FILTER (WHERE n < 5) AS n_risky,
         |  CAST(SUM(n) AS BIGINT) AS n_rows,
         |  ${sqlRound4(
             "CAST(COALESCE(SUM(n) FILTER (WHERE n < 5), 0) AS DOUBLE) / " +
             "CAST(SUM(n) AS BIGINT)")} AS risk_share
         |FROM g GROUP BY lang ORDER BY lang""".stripMargin,

    "q_mix_knapsack" ->
      s"""WITH sh AS (
         |  SELECT DISTINCT doc_id, source, ARRAY_TO_STRING(t[i:i+2], ' ') AS sh
         |  FROM (SELECT doc_id, source, STRING_SPLIT(text, ' ') AS t
         |        FROM documents),
         |    UNNEST(RANGE(1, LEN(t) - 1)) AS u(i)
         |  WHERE LEN(t) >= 3),
         |nv AS (
         |  SELECT source, COUNT(*) AS nv
         |  FROM (SELECT sh, ARG_MIN(source, doc_id) AS source
         |        FROM sh GROUP BY sh)
         |  GROUP BY source),
         |ch AS (
         |  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS chars
         |  FROM documents GROUP BY source),
         |ranked AS (
         |  SELECT ch.source, ch.chars,
         |    CAST(COALESCE(nv.nv, 0) AS BIGINT) AS nv,
         |    CAST(COALESCE(nv.nv, 0) AS DOUBLE) / ch.chars AS density
         |  FROM ch LEFT JOIN nv ON ch.source = nv.source),
         |wnd AS (
         |  SELECT source, nv, chars, density,
         |    ROW_NUMBER() OVER (ORDER BY density DESC, source) AS rnk,
         |    CAST(SUM(chars) OVER (ORDER BY density DESC, source
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         |    CAST(SUM(chars) OVER () AS BIGINT) AS tot
         |  FROM ranked)
         |SELECT rnk, source, nv, chars,
         |  ${sqlRound4("density")} AS density,
         |  CASE WHEN (cum - chars) * 2 < tot THEN 1 ELSE 0 END AS included
         |FROM wnd ORDER BY rnk""".stripMargin
  )
}

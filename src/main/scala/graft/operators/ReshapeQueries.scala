package graft.operators

import graft.QueryModule
import org.apache.spark.sql.functions._

/** Reshaping + sampling operators (§2.3 C-family extensions a complete
  * engine needs; pivot/unpivot are the classic wide↔long transforms, and
  * deterministic hash-sampling is a training-data-pipeline staple).
  *
  *   - q_pivot: wide table from (priority × status) with an EXPLICIT pivot
  *     value list — never the two-job values-discovery scan, and bounded
  *     column fan-out by construction (the 100 TB contract: pivot columns
  *     must be a known small set; pivoting on an unbounded key is a design
  *     error).
  *   - q_unpivot: the inverse melt via Spark's native unpivot operator —
  *     per-row expansion, no shuffle except the final ORDER BY.
  *   - q_sample_hash: deterministic ~10% sample by md5(doc_id) prefix.
  *     Hash-gated sampling is stable across runs, retries, and cluster
  *     sizes (unlike TABLESAMPLE/rand()), which makes training subsets
  *     reproducible and joinable: the same predicate always selects the
  *     same documents. Embarrassingly parallel scan-side filter.
  */
object ReshapeQueries extends QueryModule {

  override def queries: Map[String, Q] = Map(
    "q_pivot" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        // explicit value list: no discovery job, bounded columns
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        // pivot yields NULL for empty cells; the oracle's FILTER counts 0
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("f_cnt"),
          coalesce(col("O"), lit(0L)).as("o_cnt"),
          coalesce(col("P"), lit(0L)).as("p_cnt"))
        .orderBy("o_orderpriority")),

    "q_unpivot" -> ((s, dir) =>
      t(s, dir, "part")
        .select(col("p_partkey"),
          col("p_size").cast("double").as("p_size"),
          col("p_retailprice").as("p_retailprice"))
        .unpivot(
          Array(col("p_partkey")),
          Array(col("p_size"), col("p_retailprice")),
          "metric", "val")
        .select(col("p_partkey"), col("metric"),
          round(col("val"), 4).as("val"))
        .orderBy("p_partkey", "metric")),

    "q_sample_hash" -> ((s, dir) =>
      t(s, dir, "documents")
        // first md5 byte <= 0x19 → 26/256 ≈ 10.2% deterministic sample
        .filter(substring(md5(col("doc_id").cast("string").cast("binary")),
          1, 2) <= "19")
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy("doc_id")),

    // Deterministic source mixing: per-source keep weights (1, 1/2, 1/4,
    // 1/8 by source index mod 4 — a stand-in for a curated mix config),
    // gated by an independent md5 draw per document (salted "mix" so this
    // sample is uncorrelated with q_sample_hash's). The mixed subset is
    // reproducible across runs/cluster sizes and the keep decision is a
    // scan-side codegen'd filter — no shuffle until the audit aggregate.
    "q_source_mix" -> ((s, dir) => {
      val grp = substring(col("source"), 4, 10).cast("int") % 4
      val h = substring(
        md5(concat(lit("mix"), col("doc_id").cast("string")).cast("binary")),
        1, 2)
      val kept = grp === 0 ||
        (grp === 1 && h < "80") ||
        (grp === 2 && h < "40") ||
        (grp === 3 && h < "20")
      t(s, dir, "documents")
        .groupBy("source")
        .agg(count(lit(1)).as("n_total"),
          count(when(kept, lit(1))).as("n_kept"))
        .withColumn("kept_ratio",
          pround4(col("n_kept").cast("double") / col("n_total")))
        .orderBy("source")
    }),

    // Temperature-based source rebalancing (multilingual-LM sampling,
    // α = 1/2): source s keeps each doc with probability
    // p_s = sqrt(n_min / n_s) — flattening the source distribution toward
    // uniform while keeping every doc of the smallest source. Exact
    // cross-engine because every step is an IEEE-correctly-rounded op
    // (integer-ratio divide, sqrt, ×2^32, floor — this is why α is 1/2
    // and not an arbitrary pow(), whose libm results differ between
    // engines; the weighted-reservoir skip in SURVEY §8.4 is the same
    // judgment) and the gate compares md5 prefixes against the
    // THRESHOLD RENDERED AS AN 8-HEX-CHAR STRING, where lexicographic =
    // numeric. The min source keeps all via the n_total = n_min arm
    // (its p = 1 threshold would need 9 hex chars). Scale shape: source
    // counts are a bounded agg, rates broadcast back, gate is per-row
    // codegen on one corpus scan.
    "q_temp_mix" -> ((s, dir) => {
      // rebalances by LANGUAGE (the fixtures' skewed stratum: en carries
      // ~2.9x de's share; `source` is exactly uniform and would be
      // vacuous here)
      val docs = t(s, dir, "documents").select(col("doc_id"), col("lang"))
      val counts = docs.groupBy("lang").agg(count(lit(1)).as("n_total"))
      val nmin = counts.agg(min(col("n_total")).as("n_min"))
      val rates = counts.crossJoin(broadcast(nmin))
        .withColumn("thr", lpad(lower(hex(
          floor(sqrt(col("n_min").cast("double") / col("n_total"))
            * lit(4294967296.0)))), 8, "0"))
      docs.join(broadcast(rates), "lang")
        .withColumn("h8", substring(
          md5(concat(lit("temp"), col("doc_id").cast("string")).cast("binary")),
          1, 8))
        .withColumn("kept",
          col("n_total") === col("n_min") || col("h8") < col("thr"))
        .groupBy("lang")
        .agg(max(col("n_total")).as("n_total"),
          count(when(col("kept"), lit(1))).as("n_kept"))
        .withColumn("kept_ratio",
          pround4(col("n_kept").cast("double") / col("n_total")))
        .orderBy("lang")
    }),

    // Stratified fixed-size sample: up to N docs per language, chosen by
    // md5(key) order — deterministic (same subset every run / cluster
    // size) yet uniform within each stratum. One Exchange on the stratum
    // key + per-partition top-N; at 100 TB guard against a mega-stratum
    // with the salted two-phase top-k (q_topk_group's plan).
    "q_sample_stratified" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("lang")
        .orderBy(md5(col("doc_id").cast("string").cast("binary")),
          col("doc_id"))
      t(s, dir, "documents")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 20)
        .select(col("lang"), col("rn"), col("doc_id"))
        .orderBy("lang", "rn")
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "q_pivot" ->
      """SELECT o_orderpriority,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS f_cnt,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS o_cnt,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS p_cnt
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q_unpivot" ->
      """SELECT p_partkey, 'p_size' AS metric,
        |       ROUND(CAST(p_size AS DOUBLE), 4) AS val FROM part
        |UNION ALL
        |SELECT p_partkey, 'p_retailprice' AS metric,
        |       ROUND(p_retailprice, 4) AS val FROM part
        |ORDER BY p_partkey, metric""".stripMargin,

    "q_sample_hash" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE SUBSTRING(md5(CAST(doc_id AS VARCHAR)), 1, 2) <= '19'
        |ORDER BY doc_id""".stripMargin,

    "q_source_mix" ->
      """WITH w AS (SELECT source, doc_id,
        |    CAST(SUBSTRING(source, 4) AS INT) % 4 AS grp,
        |    SUBSTRING(md5('mix' || CAST(doc_id AS VARCHAR)), 1, 2) AS h
        |  FROM documents),
        |agg AS (SELECT source, COUNT(*) AS n_total,
        |    COUNT(*) FILTER (WHERE grp = 0 OR (grp = 1 AND h < '80')
        |      OR (grp = 2 AND h < '40') OR (grp = 3 AND h < '20'))
        |      AS n_kept
        |  FROM w GROUP BY source)
        |SELECT source, n_total, n_kept,
        |  FLOOR((CAST(n_kept AS DOUBLE) / n_total) * 10000 + 0.5) / 10000
        |    AS kept_ratio
        |FROM agg ORDER BY source""".stripMargin,

    // COUNT(...) FILTER casts to BIGINT (DuckDB FILTER-count is BIGINT
    // already, the cast is belt-and-braces); TO_HEX has no leading
    // zeros / unknown case in either engine, hence LOWER + LPAD on both
    // sides. The n_total = n_min arm mirrors the Spark kept expression.
    "q_temp_mix" ->
      """WITH counts AS (
        |  SELECT lang, COUNT(*) AS n_total FROM documents GROUP BY lang),
        |mn AS (SELECT MIN(n_total) AS n_min FROM counts),
        |rates AS (
        |  SELECT lang, n_total, n_min,
        |    LPAD(LOWER(TO_HEX(CAST(FLOOR(
        |      SQRT(CAST(n_min AS DOUBLE) / n_total) * 4294967296.0)
        |      AS BIGINT))), 8, '0') AS thr
        |  FROM counts, mn),
        |d AS (
        |  SELECT doc_id, lang,
        |    SUBSTRING(MD5('temp' || CAST(doc_id AS VARCHAR)), 1, 8) AS h8
        |  FROM documents),
        |agg AS (
        |  SELECT d.lang, MAX(r.n_total) AS n_total,
        |    CAST(COUNT(*) FILTER (WHERE r.n_total = r.n_min OR d.h8 < r.thr)
        |      AS BIGINT) AS n_kept
        |  FROM d JOIN rates r ON d.lang = r.lang
        |  GROUP BY d.lang)
        |SELECT lang, n_total, n_kept,
        |  FLOOR((CAST(n_kept AS DOUBLE) / n_total) * 10000 + 0.5) / 10000
        |    AS kept_ratio
        |FROM agg ORDER BY lang""".stripMargin,

    "q_sample_stratified" ->
      """SELECT lang, rn, doc_id FROM (
        |  SELECT lang, doc_id, ROW_NUMBER() OVER (PARTITION BY lang
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 20 ORDER BY lang, rn""".stripMargin
  )
}

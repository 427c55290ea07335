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

    "q_sample_stratified" ->
      """SELECT lang, rn, doc_id FROM (
        |  SELECT lang, doc_id, ROW_NUMBER() OVER (PARTITION BY lang
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 20 ORDER BY lang, rn""".stripMargin
  )
}

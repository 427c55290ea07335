package graft.operators

import graft.QueryModule
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.3 M — dataset-quality / drift auditing, the monitoring
  * side of a training-data pipeline (the curation queries decide what to
  * KEEP; these measure whether what's kept still looks like what was
  * measured last time):
  *
  *   - q_psi_drift: Population Stability Index of each source's n_chars
  *     distribution against the corpus-wide distribution — the standard
  *     drift score (PSI = Σ (p−q)·ln(p/q)) over 10 fixed-width length
  *     buckets with Laplace-smoothed shares, so empty buckets contribute
  *     finitely instead of blowing up the log.
  *   - q_benford: first-significant-digit audit of o_totalprice against
  *     Benford's law (expected share log10(1+1/d)) — the classic
  *     fabricated-data screen, here the data-quality smoke test.
  *   - q_winsorize: IQR winsorization of c_acctbal per market segment —
  *     clamp to [p25, p75] and report the raw vs clamped mean (the
  *     robust-mean preprocessing step before any scale-sensitive model).
  *
  * Determinism:
  *   - PSI terms are doubles with a pinned op order ((cnt+0.5)/(n+5.0),
  *     subtraction, ln of the ratio, one multiply) and are scaled to
  *     BIGINTs (floor(t·10¹⁴+0.5)) BEFORE the order-sensitive SUM — the
  *     q_pagerank discipline, so partition order can't move an ulp.
  *   - Benford digits come from the decimal string of exact integer
  *     cents (substring of a BIGINT cast — both engines print integers
  *     identically), never from log10-magnitude arithmetic.
  *   - Winsorize clamps at p25/p75 ONLY: with integer cents and
  *     quarter-exact interpolation fractions the percentile lerp is
  *     exact in double (the q_percentile analysis), so the clamped
  *     value ×4 is an exact integer — summed as BIGINTs.
  *
  * Scale notes (100 TB lens): q_psi_drift reduces the corpus to a
  * (source × 10-bucket) contingency table in ONE pass (map-side partial
  * aggregation); the dense grid, smoothing, and the PSI fold all run on
  * that KB-sized relation — drift monitoring costs one scan regardless
  * of corpus size, and the same shape serves any (slice × histogram)
  * drift matrix. q_benford is a single conditional aggregate to ≤9 rows.
  * q_winsorize is the only two-pass operator (exact percentiles need a
  * sort); its grouped percentile runs per segment and the 5-row bounds
  * relation broadcasts back onto the fact scan — at 100 TB the exact
  * pass swaps for approx_percentile with the same join shape.
  */
object QualityQueries extends QueryModule {

  /** PSI bucket geometry: 10 fixed-width n_chars buckets of 64 chars. */
  private val PsiBuckets = 10
  private val PsiWidth = 64

  override def queries: Map[String, Q] = Map(
    // Per-source PSI of the n_chars histogram vs the corpus histogram.
    "q_psi_drift" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("source"),
          expr(s"CAST(LEAST(n_chars DIV $PsiWidth, ${PsiBuckets - 1}) AS INT)")
            .as("b"))
      // ONE corpus scan: the (source × bucket) contingency table is the
      // only corpus-grained aggregate; the marginals (per-bucket,
      // per-source, grand total) and the dense grid all derive from it —
      // without the barrier each marginal would be its own full scan
      val bySrc = graft.functions.Materialize(
        docs.groupBy("source", "b").agg(count(lit(1)).as("cnt")))
      val all = bySrc.groupBy("b").agg(sum(col("cnt")).as("cnt_all"))
      val grid = bySrc.select("source").distinct()
        .select(col("source"),
          explode(sequence(lit(0), lit(PsiBuckets - 1))).as("b"))
      val nSrc = bySrc.groupBy("source").agg(sum(col("cnt")).as("n_docs"))
      val nAll = bySrc.agg(sum(col("cnt")).as("n_all"))
      val sm = lit(0.5)
      val den = lit(PsiBuckets * 0.5)
      val terms = grid
        .join(bySrc, Seq("source", "b"), "left")
        .join(broadcast(all), Seq("b"), "left")
        .join(broadcast(nSrc), Seq("source"))
        .crossJoin(broadcast(nAll))
        .select(col("source"), col("n_docs"),
          ((coalesce(col("cnt"), lit(0L)) + sm) /
            (col("n_docs") + den)).as("p"),
          ((coalesce(col("cnt_all"), lit(0L)) + sm) /
            (col("n_all") + den)).as("q"))
        .select(col("source"), col("n_docs"),
          floor((col("p") - col("q")) * log(col("p") / col("q")) * lit(1e14)
            + lit(0.5)).cast("bigint").as("ti"))
      terms.groupBy("source")
        .agg(max(col("n_docs")).as("n_docs"),
          pround4(sum(col("ti")).cast("double") / lit(1e14)).as("psi"))
        .orderBy("source")
    }),

    // Gini coefficient of document length per source — the inequality
    // audit next to PSI's drift: a source whose token mass concentrates
    // in a few giant docs trains differently from one with uniform docs.
    // Exact integers end to end: the rank formula
    // G = (2·Σ rank·x − (n+1)·Σx) / (n·Σx) runs on BIGINTs (ties are
    // formula-invariant, so the doc_id tiebreak only pins determinism);
    // one ranked window and one aggregate, both keyed on source.
    "q_gini_length" -> ((s, dir) => {
      val w = Window.partitionBy("source").orderBy("x", "doc_id")
      t(s, dir, "documents")
        .select(col("source"), col("doc_id"),
          col("n_chars").cast("long").as("x"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("rk") * col("x")).as("srx"), sum(col("x")).as("sx"))
        .select(col("source"), col("n_docs"),
          pround4((lit(2L) * col("srx") - (col("n_docs") + 1) * col("sx"))
            .cast("double") /
            nullif((col("n_docs") * col("sx")).cast("double"), lit(0.0)))
            .as("gini")) // NULL (not NaN) when every length is 0
        .orderBy("source")
    }),

    // Calendar-completeness audit: per event type, the expected day
    // spine (global min..max) vs observed days — the
    // missing-partition/ingestion-gap check every scheduled pipeline
    // runs before trusting a daily rollup. The spine is a 1-row span
    // aggregate exploded to |days| rows and crossed with the type
    // alphabet — KB-sized regardless of corpus; observed days reduce
    // map-side to the same (type, day) grain.
    "q_completeness" -> ((s, dir) => {
      // ONE corpus scan: the distinct (type, day) relation is the only
      // corpus-grained aggregate; the day span and the type alphabet
      // both derive from it (global min/max day == min/max over the
      // distinct relation), so the spine costs KB, not another scan
      val seen = graft.functions.Materialize(
        t(s, dir, "events")
          .select(col("event_type"), col("ts").cast("date").as("d"))
          .distinct())
        .withColumn("present", lit(1))
      val span = seen.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      val spine = seen.select(col("event_type")).distinct()
        .crossJoin(broadcast(span))
        .select(col("event_type"),
          explode(sequence(col("d0"), col("d1"), expr("interval 1 day")))
            .as("d"))
      spine.join(seen, Seq("event_type", "d"), "left")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_expected"),
          sum(coalesce(col("present"), lit(0))).cast("bigint")
            .as("n_observed"),
          sum(when(col("present").isNull, 1L).otherwise(0L))
            .as("n_missing"),
          date_format(min(when(col("present").isNull, col("d"))),
            "yyyy-MM-dd").as("first_missing"))
        .orderBy("event_type")
    }),

    // Exact-duplicate cluster-size histogram: group docs by text md5,
    // then histogram the cluster sizes — the "how much would dedup
    // save" planning view (n_docs − n_clusters rows deleted at size s).
    // Hashes shuffle, text never does; the histogram grain is bounded
    // by the largest cluster size.
    "q_dup_histogram" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy(md5(col("text").cast("binary")).as("h"))
        .agg(count(lit(1)).as("sz"))
        .groupBy("sz")
        .agg(count(lit(1)).as("n_clusters"))
        .select(col("sz"), col("n_clusters"),
          (col("sz") * col("n_clusters")).as("n_docs"),
          ((col("sz") - 1) * col("n_clusters")).as("n_removable"))
        .orderBy("sz")
    }),

    // Benford first-digit audit of order totals (digit from the decimal
    // string of exact integer cents).
    "q_benford" -> ((s, dir) => {
      val full = Window.partitionBy(lit(1))
      t(s, dir, "orders")
        .select(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")
          .as("cents"))
        .filter(col("cents") > 0) // ≤ 0 has no leading digit (and 1/0 in exp)
        .select(substring(col("cents").cast("string"), 1, 1).cast("int")
          .as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n"))
        .withColumn("tot", sum(col("n")).over(full))
        .select(col("digit"), col("n"),
          pround4(col("n").cast("double") / col("tot")).as("obs_share"),
          pround4(log10(lit(1.0) + lit(1.0) / col("digit")))
            .as("exp_share"))
        .orderBy("digit")
    }),

    // IQR winsorization per market segment: clamp cents to [p25, p75],
    // report raw vs clamped means (clamped ×4 is an exact BIGINT).
    "q_winsorize" -> ((s, dir) => {
      val base = t(s, dir, "customer")
        .select(col("c_mktsegment"),
          floor(col("c_acctbal") * 100 + lit(0.5)).cast("long").as("cents"))
      val bounds = base.groupBy("c_mktsegment")
        .agg(expr("percentile(cents, 0.25D)").as("p25"),
          expr("percentile(cents, 0.75D)").as("p75"))
      base.join(broadcast(bounds), Seq("c_mktsegment"))
        .select(col("c_mktsegment"), col("cents"), col("p25"), col("p75"),
          (least(greatest(col("cents").cast("double"), col("p25")),
            col("p75")) * 4).cast("bigint").as("clip4"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
          pround4(sum(col("cents")).cast("double") / count(lit(1)))
            .as("mean_raw_c"),
          pround4(sum(col("clip4")).cast("double") / count(lit(1)) / 4)
            .as("mean_wins_c"),
          pround4(max(col("p25"))).as("p25_c"),
          pround4(max(col("p75"))).as("p75_c"))
        .orderBy("c_mktsegment")
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "q_psi_drift" ->
      s"""WITH docs AS (
         |  SELECT source,
         |    CAST(LEAST(n_chars // $PsiWidth, ${PsiBuckets - 1}) AS INT) AS b
         |  FROM documents),
         |by_src AS (SELECT source, b, COUNT(*) AS cnt
         |  FROM docs GROUP BY source, b),
         |alls AS (SELECT b, COUNT(*) AS cnt_all FROM docs GROUP BY b),
         |n_src AS (SELECT source, COUNT(*) AS n_docs
         |  FROM docs GROUP BY source),
         |n_all AS (SELECT COUNT(*) AS n_all FROM docs),
         |grid AS (SELECT DISTINCT source, u.b
         |  FROM docs, UNNEST(RANGE(0, $PsiBuckets)) AS u(b)),
         |terms AS (
         |  SELECT g.source, n_src.n_docs,
         |    (COALESCE(cnt, 0) + 0.5) / (n_src.n_docs + ${PsiBuckets * 0.5})
         |      AS p,
         |    (COALESCE(cnt_all, 0) + 0.5) / (n_all.n_all + ${PsiBuckets * 0.5})
         |      AS q
         |  FROM grid g
         |  LEFT JOIN by_src ON g.source = by_src.source AND g.b = by_src.b
         |  LEFT JOIN alls ON g.b = alls.b
         |  JOIN n_src ON g.source = n_src.source
         |  CROSS JOIN n_all),
         |ti AS (SELECT source, n_docs,
         |    CAST(FLOOR((p - q) * LN(p / q) * 1e14 + 0.5) AS BIGINT) AS ti
         |  FROM terms)
         |SELECT source, MAX(n_docs) AS n_docs,
         |  ${sqlRound4("CAST(SUM(ti) AS DOUBLE) / 1e14")} AS psi
         |FROM ti GROUP BY source ORDER BY source""".stripMargin,

    "q_gini_length" ->
      s"""WITH rk AS (
         |  SELECT source, CAST(n_chars AS BIGINT) AS x,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY source
         |      ORDER BY n_chars, doc_id) AS BIGINT) AS rk
         |  FROM documents)
         |SELECT source, COUNT(*) AS n_docs,
         |  ${sqlRound4(
             "CAST(2 * SUM(rk * x) - (COUNT(*) + 1) * SUM(x) AS DOUBLE) / " +
             "NULLIF(CAST(COUNT(*) * SUM(x) AS DOUBLE), 0)")} AS gini
         |FROM rk GROUP BY source ORDER BY source""".stripMargin,

    "q_completeness" ->
      """WITH span AS (
        |  SELECT MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1
        |  FROM events),
        |spine AS (
        |  SELECT t.event_type, CAST(u.d AS DATE) AS d
        |  FROM (SELECT DISTINCT event_type FROM events) t
        |  CROSS JOIN span, UNNEST(GENERATE_SERIES(span.d0, span.d1,
        |    INTERVAL 1 DAY)) AS u(d)),
        |seen AS (
        |  SELECT DISTINCT event_type, CAST(ts AS DATE) AS d, 1 AS present
        |  FROM events)
        |SELECT sp.event_type, COUNT(*) AS n_expected,
        |  CAST(SUM(COALESCE(present, 0)) AS BIGINT) AS n_observed,
        |  CAST(SUM(CASE WHEN present IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_missing,
        |  STRFTIME(MIN(CASE WHEN present IS NULL THEN sp.d END),
        |    '%Y-%m-%d') AS first_missing
        |FROM spine sp LEFT JOIN seen
        |  ON sp.event_type = seen.event_type AND sp.d = seen.d
        |GROUP BY sp.event_type ORDER BY sp.event_type""".stripMargin,

    "q_dup_histogram" ->
      """WITH cl AS (SELECT md5(text) AS h, COUNT(*) AS sz
        |  FROM documents GROUP BY md5(text))
        |SELECT sz, COUNT(*) AS n_clusters,
        |  sz * COUNT(*) AS n_docs,
        |  (sz - 1) * COUNT(*) AS n_removable
        |FROM cl GROUP BY sz ORDER BY sz""".stripMargin,

    "q_benford" ->
      s"""WITH c AS (
         |  SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
         |  FROM orders),
         |d AS (
         |  SELECT CAST(SUBSTR(CAST(cents AS VARCHAR), 1, 1) AS INT)
         |    AS digit
         |  FROM c WHERE cents > 0),
         |g AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
         |a AS (SELECT *, SUM(n) OVER () AS tot FROM g)
         |SELECT digit, n,
         |  ${sqlRound4("CAST(n AS DOUBLE) / tot")} AS obs_share,
         |  ${sqlRound4("LOG10(1.0 + 1.0 / digit)")} AS exp_share
         |FROM a ORDER BY digit""".stripMargin,

    "q_winsorize" ->
      s"""WITH base AS (
         |  SELECT c_mktsegment,
         |    CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
         |  FROM customer),
         |bounds AS (
         |  SELECT c_mktsegment, QUANTILE_CONT(cents, 0.25) AS p25,
         |    QUANTILE_CONT(cents, 0.75) AS p75
         |  FROM base GROUP BY c_mktsegment),
         |j AS (
         |  SELECT base.c_mktsegment, cents, p25, p75,
         |    CAST(LEAST(GREATEST(CAST(cents AS DOUBLE), p25), p75) * 4
         |      AS BIGINT) AS clip4
         |  FROM base JOIN bounds USING (c_mktsegment))
         |SELECT c_mktsegment, COUNT(*) AS n,
         |  ${sqlRound4("CAST(SUM(cents) AS DOUBLE) / COUNT(*)")}
         |    AS mean_raw_c,
         |  ${sqlRound4("CAST(SUM(clip4) AS DOUBLE) / COUNT(*) / 4")}
         |    AS mean_wins_c,
         |  ${sqlRound4("MAX(p25)")} AS p25_c,
         |  ${sqlRound4("MAX(p75)")} AS p75_c
         |FROM j GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
  )
}

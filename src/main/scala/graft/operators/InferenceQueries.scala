package graft.operators

import graft.QueryModule
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** SURVEY.md §2.3 M — statistical inference beyond the test statistics
  * (q_ks_test/q_chisq started the family; these add estimation):
  *
  *   - q_welch_ttest: pairwise Welch's unequal-variance t over per-language
  *     length distributions — the robust two-sample mean test (q_ab_test is
  *     the proportion flavor; this is the continuous one).
  *   - q_bootstrap_ci: PER-LANGUAGE mean length with a POISSON-bootstrap
  *     standard error [Chamandy et al., "Estimating Uncertainty for
  *     Massive Data Streams", 2012] — the single-pass resampling scheme
  *     used at web scale: each row draws B independent Poisson(1) weights
  *     from a deterministic hash, so a replicate is a weighted mean and
  *     the whole bootstrap is ONE scan, no sampling-by-index.
  *   - q_ols2: closed-form two-feature OLS (purchases ~ views + clicks at
  *     user grain) via the centered normal equations and Cramer's rule —
  *     regression as an aggregate, no iterative solver.
  *   - q_log_odds: Monroe-style log-odds-ratio with an add-half Dirichlet
  *     prior [Monroe, Colaresi & Quinn, "Fightin' Words", 2008] — the
  *     top-5 tokens most DISTINGUISHING of each source vs the rest of the
  *     corpus, by z-score. The corpus-comparison diagnostic a training-mix
  *     curator runs before blending sources.
  *
  * Determinism:
  *   - Welch variance numerators are exact BIGINTs (n·Σx² − (Σx)²); every
  *     double op after that is the same pinned sequence in both engines.
  *   - Bootstrap weights are integer threshold compares: the 48-bit md5
  *     hash of (doc_id, b) against precomputed floor(CDF_Poisson(1)·2⁴⁸)
  *     constants — no float in the draw at all. Replicate means are exact
  *     BIGINT ratios; only the final stddev over ≤32 replicate means is
  *     float (round4 both sides).
  *   - OLS S-terms are exact BIGINTs; the 2×2 determinant products run in
  *     DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) — both exact int128 — and
  *     the betas are single correctly-rounded double divisions.
  *   - Log-odds counts are exact; ln/sqrt are the same IEEE sequence.
  *
  * Scale notes (100 TB lens):
  *   - q_welch_ttest reduces the corpus to a 5-row (lang, n, Σx, Σx²)
  *     relation in one pass; the pair cross is alphabet-bounded.
  *   - q_bootstrap_ci fans each row ×B inside whole-stage codegen (a
  *     generator — no materialization), and the partial aggregate
  *     collapses it map-side to lang×B groups, so the shuffle carries
  *     ~KBs regardless of corpus size. This is WHY Poisson bootstrap is
  *     the scalable bootstrap: resample-by-index needs a pass per
  *     replicate, this needs one total.
  *   - q_ols2 is two aggregates (user grain, then global sums) — the
  *     normal-equation solve happens on ONE row.
  *   - q_log_odds shuffles (source, token) counts — vocabulary-bounded —
  *     and every join after the first groupBy is on aggregate relations.
  */
object InferenceQueries extends QueryModule {

  /** floor(CDF_Poisson(λ=1)(k) · 2⁴⁸) for k = 0..5; hash ≥ last ⇒ w = 6.
    * Exact integer constants so the draw never touches a float. Shared
    * with the streaming twin (streaming/StreamingBootstrap) so both draw
    * IDENTICAL weights for the same (doc_id, replicate). */
  private[graft] val PoissonT: Seq[Long] = Seq(
    103548857136060L, 207097714272121L, 258872142840152L,
    276130285696162L, 280444821410164L, 281307728552965L)

  /** Bootstrap replicate count — shared with the streaming twin so the
    * batch/stream parity contract cannot drift on one of its two
    * constants (PoissonT is the other). */
  private[graft] val B = 32

  override def queries: Map[String, Q] = Map(
    // Pairwise Welch t: for every lang pair, is the mean length different?
    "q_welch_ttest" -> ((s, dir) => {
      val st = t(s, dir, "documents")
        .groupBy("lang")
        .agg(count(lit(1)).as("n"),
          sum(col("n_chars")).as("s1"),
          sum(col("n_chars") * col("n_chars")).as("s2"))
        // mean and variance/n from exact BIGINT sums; one division each
        .select(col("lang"), col("n"),
          (col("s1").cast("double") / col("n")).as("m"),
          (((col("n") * col("s2") - col("s1") * col("s1")).cast("double")
            / (col("n") * (col("n") - 1))) / col("n")).as("vn"))
      val a = st.select(col("lang").as("l1"), col("n").as("n1"),
        col("m").as("m1"), col("vn").as("vn1"))
      val b = st.select(col("lang").as("l2"), col("n").as("n2"),
        col("m").as("m2"), col("vn").as("vn2"))
      a.crossJoin(b).filter(col("l1") < col("l2"))
        .select(col("l1"), col("l2"), col("n1"), col("n2"),
          pround4((col("m1") - col("m2"))
            / sqrt(col("vn1") + col("vn2"))).as("t_stat"),
          pround4(((col("vn1") + col("vn2")) * (col("vn1") + col("vn2")))
            / (col("vn1") * col("vn1") / (col("n1") - 1)
              + col("vn2") * col("vn2") / (col("n2") - 1))).as("df"))
        .orderBy("l1", "l2")
    }),

    // Poisson-bootstrap SE and 95% CI of the per-language mean length.
    "q_bootstrap_ci" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val w = PoissonT.zipWithIndex.foldRight(lit(6L)) {
        case ((thr, k), rest) => when(col("hv") < thr, lit(k.toLong))
          .otherwise(rest)
      }
      val rep = docs
        .select(col("lang"), col("n_chars"),
          explode(sequence(lit(1), lit(B))).as("b"),
          col("doc_id"))
        .withColumn("hv", hv48(concat(col("doc_id").cast("string"),
          lit(":"), col("b").cast("string"))))
        .withColumn("w", w)
        .groupBy("lang", "b")
        .agg(sum(col("w") * col("n_chars")).as("swx"), sum(col("w")).as("sw"))
        .select(col("lang"),
          when(col("sw") > 0, col("swx").cast("double") / col("sw")).as("rm"))
        .groupBy("lang")
        .agg(stddev_samp(col("rm")).as("se"), count(col("rm")).as("nrep"))
      val point = docs.groupBy("lang")
        .agg(count(lit(1)).as("n"),
          (sum(col("n_chars")).cast("double") / count(lit(1))).as("m"))
      point.join(rep, Seq("lang"))
        .select(col("lang"), col("n"), col("nrep"),
          pround4(col("m")).as("mean_chars"),
          pround4(col("se")).as("boot_se"),
          pround4(col("m") - lit(1.96) * col("se")).as("ci_lo"),
          pround4(col("m") + lit(1.96) * col("se")).as("ci_hi"))
        .orderBy("lang")
    }),

    // Closed-form OLS: purchases ~ views + clicks at user grain.
    "q_ols2" -> ((s, dir) => {
      val d38 = DecimalType(38, 0)
      val peru = t(s, dir, "events")
        .groupBy("user_id")
        .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("x1"),
          sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("x2"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
      val sums = peru.agg(
        count(lit(1)).as("n"),
        sum(col("x1")).as("sx1"), sum(col("x2")).as("sx2"),
        sum(col("y")).as("sy"),
        sum(col("x1") * col("x1")).as("sx1x1"),
        sum(col("x2") * col("x2")).as("sx2x2"),
        sum(col("x1") * col("x2")).as("sx1x2"),
        sum(col("x1") * col("y")).as("sx1y"),
        sum(col("x2") * col("y")).as("sx2y"),
        sum(col("y") * col("y")).as("syy"))
      // centered S-terms: exact BIGINTs (n·Σab − Σa·Σb)
      val cent = sums.select(col("n"), col("sx1"), col("sx2"), col("sy"),
        (col("n") * col("sx1x1") - col("sx1") * col("sx1")).as("cx1x1"),
        (col("n") * col("sx2x2") - col("sx2") * col("sx2")).as("cx2x2"),
        (col("n") * col("sx1x2") - col("sx1") * col("sx2")).as("cx1x2"),
        (col("n") * col("sx1y") - col("sx1") * col("sy")).as("cx1y"),
        (col("n") * col("sx2y") - col("sx2") * col("sy")).as("cx2y"),
        (col("n") * col("syy") - col("sy") * col("sy")).as("cyy"))
      // 2×2 Cramer in exact int128 (DECIMAL(38,0) ↔ oracle HUGEINT)
      val det = cent
        .select(col("n"), col("sx1"), col("sx2"), col("sy"),
          col("cx1y"), col("cx2y"), col("cyy"),
          (col("cx1x1").cast(d38) * col("cx2x2").cast(d38)
            - col("cx1x2").cast(d38) * col("cx1x2").cast(d38)).as("det"),
          (col("cx2x2").cast(d38) * col("cx1y").cast(d38)
            - col("cx1x2").cast(d38) * col("cx2y").cast(d38)).as("b1n"),
          (col("cx1x1").cast(d38) * col("cx2y").cast(d38)
            - col("cx1x2").cast(d38) * col("cx1y").cast(d38)).as("b2n"))
        .select(col("n"), col("sx1"), col("sx2"), col("sy"),
          col("cx1y"), col("cx2y"), col("cyy"),
          (col("b1n").cast("double") / col("det").cast("double")).as("b1"),
          (col("b2n").cast("double") / col("det").cast("double")).as("b2"))
      det.select(col("n").as("n_users"),
        pround4(col("b1")).as("beta_views"),
        pround4(col("b2")).as("beta_clicks"),
        pround4((col("sy").cast("double") - col("b1") * col("sx1")
          - col("b2") * col("sx2")) / col("n")).as("intercept"),
        pround4((col("b1") * col("cx1y").cast("double")
          + col("b2") * col("cx2y").cast("double"))
          / col("cyy").cast("double")).as("r2"))
    }),

    // Pairwise Pearson correlation of event-type daily counts — the
    // feature-correlation audit over the (day × type) dense grid.
    "q_corr_matrix" -> ((s, dir) => {
      val daily = graft.functions.Materialize(
        t(s, dir, "events")
          .groupBy(to_date(col("ts")).as("d"), col("event_type").as("t"))
          .agg(count(lit(1)).as("c")))
      val dense = daily.select("d").distinct()
        .crossJoin(daily.select("t").distinct())
        .join(daily, Seq("d", "t"), "left")
        .select(col("d"), col("t"), coalesce(col("c"), lit(0L)).as("c"))
      val a = dense.select(col("d"), col("t").as("t1"), col("c").as("x"))
      val b = dense.select(col("d").as("d2"), col("t").as("t2"),
        col("c").as("y"))
      a.join(b, col("d") === col("d2") && col("t1") < col("t2"))
        .groupBy("t1", "t2")
        .agg(count(lit(1)).as("n_days"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .select(col("t1"), col("t2"), col("n_days"),
          pround4({
            val dx = col("n_days") * col("sxx") - col("sx") * col("sx")
            val dy = col("n_days") * col("syy") - col("sy") * col("sy")
            when(dx > 0 && dy > 0,
              (col("n_days") * col("sxy") - col("sx") * col("sy"))
                .cast("double")
                / sqrt(dx.cast("double") * dy.cast("double")))
          }).as("r"))
        .orderBy("t1", "t2")
    }),

    // Monroe log-odds: top-5 tokens most distinguishing each source.
    "q_log_odds" -> ((s, dir) => {
      // served from the write-once TokenStore artifact (round-11): the
      // (source, w) counts aggregate the stored per-doc tf rows — no
      // tokenize, and the stored parquet replaces the Materialize
      // barrier its four consumers needed; the from-scratch oracle
      // proves stored ≡ derived on every sweep
      val cst = graft.functions.Materialize(
        graft.functions.TokenStore.termFreq(s, dir)
          .filter(col("w") =!= "")
          .groupBy("source", "w")
          .agg(sum(col("tf")).as("c")))
      val ct = cst.groupBy("w").agg(sum(col("c")).as("ctot"))
      val ns = cst.groupBy("source").agg(sum(col("c")).as("nsrc"))
      val tot = cst.agg(sum(col("c")).as("ntot"),
        countDistinct(col("w")).as("v"))
      val z = cst.join(ct, Seq("w")).join(ns, Seq("source"))
        .crossJoin(broadcast(tot))
        .select(col("source"), col("w"),
          ((log((col("c") + 0.5)
            / (col("nsrc").cast("double") + lit(0.5) * col("v") - col("c") - 0.5))
            - log((col("ctot") - col("c") + 0.5)
              / ((col("ntot") - col("nsrc")).cast("double") + lit(0.5) * col("v")
                - (col("ctot") - col("c")) - 0.5)))
            / sqrt(lit(1.0) / (col("c") + 0.5)
              + lit(1.0) / (col("ctot") - col("c") + 0.5))).as("z"))
      z.withColumn("rnk", row_number().over(
          Window.partitionBy("source").orderBy(col("z").desc, col("w"))))
        .filter(col("rnk") <= 5)
        .select(col("source"), col("rnk"), col("w").as("token"),
          pround4(col("z")).as("z_score"))
        .orderBy("source", "rnk")
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "q_welch_ttest" ->
      s"""WITH st AS (
         |  SELECT lang, COUNT(*) AS n,
         |    CAST(SUM(n_chars) AS BIGINT) AS s1,
         |    CAST(SUM(n_chars * n_chars) AS BIGINT) AS s2
         |  FROM documents GROUP BY lang),
         |mv AS (
         |  SELECT lang, n, CAST(s1 AS DOUBLE) / n AS m,
         |    (CAST(n * s2 - s1 * s1 AS DOUBLE) / (n * (n - 1))) / n AS vn
         |  FROM st)
         |SELECT a.lang AS l1, b.lang AS l2, a.n AS n1, b.n AS n2,
         |  ${sqlRound4("(a.m - b.m) / SQRT(a.vn + b.vn)")} AS t_stat,
         |  ${sqlRound4(
             "((a.vn + b.vn) * (a.vn + b.vn)) / " +
             "(a.vn * a.vn / (a.n - 1) + b.vn * b.vn / (b.n - 1))")} AS df
         |FROM mv a JOIN mv b ON a.lang < b.lang
         |ORDER BY l1, l2""".stripMargin,

    "q_bootstrap_ci" -> {
      val hex12 = sqlHv48("h")
      val wCase = "CASE " + PoissonT.zipWithIndex
        .map { case (thr, k) => s"WHEN hv < $thr THEN $k" }
        .mkString(" ") + " ELSE 6 END"
      s"""WITH fan AS (
         |  SELECT lang, n_chars, doc_id, UNNEST(RANGE(1, ${B + 1})) AS b
         |  FROM documents),
         |hvs AS (
         |  SELECT lang, n_chars,
         |    md5(CAST(doc_id AS VARCHAR) || ':' || CAST(b AS VARCHAR)) AS h,
         |    b
         |  FROM fan),
         |wts AS (
         |  SELECT lang, n_chars, b, $wCase AS w
         |  FROM (SELECT lang, n_chars, b, $hex12 AS hv FROM hvs)),
         |rep AS (
         |  SELECT lang, b, CAST(SUM(w * n_chars) AS BIGINT) AS swx,
         |    CAST(SUM(w) AS BIGINT) AS sw
         |  FROM wts GROUP BY lang, b),
         |boot AS (
         |  SELECT lang, STDDEV_SAMP(rm) AS se, COUNT(rm) AS nrep
         |  FROM (SELECT lang,
         |    CASE WHEN sw > 0 THEN CAST(swx AS DOUBLE) / sw END AS rm
         |    FROM rep)
         |  GROUP BY lang),
         |pt AS (
         |  SELECT lang, COUNT(*) AS n,
         |    CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS m
         |  FROM documents GROUP BY lang)
         |SELECT p.lang, p.n, b.nrep,
         |  ${sqlRound4("p.m")} AS mean_chars,
         |  ${sqlRound4("b.se")} AS boot_se,
         |  ${sqlRound4("p.m - 1.96 * b.se")} AS ci_lo,
         |  ${sqlRound4("p.m + 1.96 * b.se")} AS ci_hi
         |FROM pt p JOIN boot b ON p.lang = b.lang
         |ORDER BY p.lang""".stripMargin
    },

    "q_ols2" ->
      s"""WITH peru AS (
         |  SELECT user_id,
         |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS x1,
         |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS x2,
         |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS y
         |  FROM events GROUP BY user_id),
         |sums AS (
         |  SELECT COUNT(*) AS n,
         |    CAST(SUM(x1) AS BIGINT) AS sx1, CAST(SUM(x2) AS BIGINT) AS sx2,
         |    CAST(SUM(y) AS BIGINT) AS sy,
         |    CAST(SUM(x1 * x1) AS BIGINT) AS sx1x1,
         |    CAST(SUM(x2 * x2) AS BIGINT) AS sx2x2,
         |    CAST(SUM(x1 * x2) AS BIGINT) AS sx1x2,
         |    CAST(SUM(x1 * y) AS BIGINT) AS sx1y,
         |    CAST(SUM(x2 * y) AS BIGINT) AS sx2y,
         |    CAST(SUM(y * y) AS BIGINT) AS syy
         |  FROM peru),
         |cent AS (
         |  SELECT n, sx1, sx2, sy,
         |    n * sx1x1 - sx1 * sx1 AS cx1x1,
         |    n * sx2x2 - sx2 * sx2 AS cx2x2,
         |    n * sx1x2 - sx1 * sx2 AS cx1x2,
         |    n * sx1y - sx1 * sy AS cx1y,
         |    n * sx2y - sx2 * sy AS cx2y,
         |    n * syy - sy * sy AS cyy
         |  FROM sums),
         |det AS (
         |  SELECT n, sx1, sx2, sy, cx1y, cx2y, cyy,
         |    CAST(CAST(cx2x2 AS HUGEINT) * cx1y
         |      - CAST(cx1x2 AS HUGEINT) * cx2y AS DOUBLE)
         |    / CAST(CAST(cx1x1 AS HUGEINT) * cx2x2
         |      - CAST(cx1x2 AS HUGEINT) * cx1x2 AS DOUBLE) AS b1,
         |    CAST(CAST(cx1x1 AS HUGEINT) * cx2y
         |      - CAST(cx1x2 AS HUGEINT) * cx1y AS DOUBLE)
         |    / CAST(CAST(cx1x1 AS HUGEINT) * cx2x2
         |      - CAST(cx1x2 AS HUGEINT) * cx1x2 AS DOUBLE) AS b2
         |  FROM cent)
         |SELECT n AS n_users,
         |  ${sqlRound4("b1")} AS beta_views,
         |  ${sqlRound4("b2")} AS beta_clicks,
         |  ${sqlRound4(
             "(CAST(sy AS DOUBLE) - b1 * sx1 - b2 * sx2) / n")} AS intercept,
         |  ${sqlRound4(
             "(b1 * CAST(cx1y AS DOUBLE) + b2 * CAST(cx2y AS DOUBLE)) / " +
             "CAST(cyy AS DOUBLE)")} AS r2
         |FROM det""".stripMargin,

    "q_corr_matrix" ->
      s"""WITH daily AS (
         |  SELECT CAST(ts AS DATE) AS d, event_type AS t, COUNT(*) AS c
         |  FROM events GROUP BY 1, 2),
         |dense AS (
         |  SELECT g.d, g.t, CAST(COALESCE(daily.c, 0) AS BIGINT) AS c
         |  FROM (SELECT dd.d, tt.t
         |        FROM (SELECT DISTINCT d FROM daily) dd
         |        CROSS JOIN (SELECT DISTINCT t FROM daily) tt) g
         |  LEFT JOIN daily ON g.d = daily.d AND g.t = daily.t),
         |pairs AS (
         |  SELECT a.t AS t1, b.t AS t2, COUNT(*) AS n_days,
         |    CAST(SUM(a.c) AS BIGINT) AS sx, CAST(SUM(b.c) AS BIGINT) AS sy,
         |    CAST(SUM(a.c * b.c) AS BIGINT) AS sxy,
         |    CAST(SUM(a.c * a.c) AS BIGINT) AS sxx,
         |    CAST(SUM(b.c * b.c) AS BIGINT) AS syy
         |  FROM dense a JOIN dense b ON a.d = b.d AND a.t < b.t
         |  GROUP BY a.t, b.t)
         |SELECT t1, t2, n_days,
         |  ${sqlRound4(
             "CASE WHEN n_days * sxx - sx * sx > 0 " +
             "AND n_days * syy - sy * sy > 0 THEN " +
             "CAST(n_days * sxy - sx * sy AS DOUBLE) / " +
             "SQRT(CAST(n_days * sxx - sx * sx AS DOUBLE) * " +
             "CAST(n_days * syy - sy * sy AS DOUBLE)) END")} AS r
         |FROM pairs ORDER BY t1, t2""".stripMargin,

    "q_log_odds" ->
      s"""WITH cst AS (
         |  SELECT source, w, COUNT(*) AS c
         |  FROM (SELECT source, UNNEST(STRING_SPLIT(text, ' ')) AS w
         |        FROM documents)
         |  WHERE w <> '' GROUP BY source, w),
         |ct AS (SELECT w, CAST(SUM(c) AS BIGINT) AS ctot
         |  FROM cst GROUP BY w),
         |ns AS (SELECT source, CAST(SUM(c) AS BIGINT) AS nsrc
         |  FROM cst GROUP BY source),
         |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS ntot,
         |    COUNT(DISTINCT w) AS v
         |  FROM cst),
         |z AS (
         |  SELECT cst.source, cst.w,
         |    (LN((cst.c + 0.5)
         |       / (CAST(ns.nsrc AS DOUBLE) + 0.5 * tot.v - cst.c - 0.5))
         |     - LN((ct.ctot - cst.c + 0.5)
         |       / (CAST(tot.ntot - ns.nsrc AS DOUBLE) + 0.5 * tot.v
         |          - (ct.ctot - cst.c) - 0.5)))
         |    / SQRT(1.0 / (cst.c + 0.5) + 1.0 / (ct.ctot - cst.c + 0.5))
         |      AS z
         |  FROM cst JOIN ct ON cst.w = ct.w
         |  JOIN ns ON cst.source = ns.source CROSS JOIN tot),
         |rk AS (
         |  SELECT source, w, z, ROW_NUMBER() OVER (PARTITION BY source
         |    ORDER BY z DESC, w) AS rnk
         |  FROM z)
         |SELECT source, rnk, w AS token, ${sqlRound4("z")} AS z_score
         |FROM rk WHERE rnk <= 5 ORDER BY source, rnk""".stripMargin
  )
}

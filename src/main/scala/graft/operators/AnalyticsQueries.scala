package graft.operators

import graft.QueryModule
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.3 L — statistical corpus/stream analytics: information-
  * theoretic text quality (token entropy, unigram LM log-prob), daily
  * event-count anomaly z-scores, a salted skew-proof join proven equal to
  * the plain join, and integer-exact edit-distance near-dup verification.
  *
  * Determinism: entropy/log-prob use LOG2 over integer counts (continuous
  * outputs under the portable round, same class as the cosine/stddev
  * queries); z-scores compare on the ROUNDED value so the ±2 anomaly flag
  * can never flip on a cross-engine ulp; levenshtein is integer-exact in
  * both engines (cast to BIGINT — DuckDB returns int64, Spark int32).
  *
  * Scale notes (100 TB posture):
  *   - q_token_entropy / q_unigram_logprob are the word-count plan: the
  *     generator explodes inside codegen, partial aggregation runs map-side,
  *     and post-shuffle state is bounded by |vocab| × docs-per-partition.
  *     The unigram model (vocab, count) is vocabulary-bounded → broadcast;
  *     the corpus total is a 1-row broadcast. No join shuffles the corpus.
  *   - q_event_anomaly aggregates to (event_type × day) — bounded output —
  *     before any window; the windows run over the aggregated relation.
  *   - q_join_skew_salt is the skew recipe as a driver-gated equivalence:
  *     fact rows spread a hot key over 8 salt shards (pmod on a unique id),
  *     the dim side replicates ×8 via explode(sequence) — shuffle of the
  *     hot key divides by 8 while results stay bit-identical to the plain
  *     join the oracle runs. At 100 TB you'd gate the salting on observed
  *     key skew (AQE skew-join handles moderate cases for free).
  *   - q_editdist_pairs blocks on (lang, 24-char prefix) so candidate
  *     fan-out is per-bucket quadratic only within tiny buckets (max 2 at
  *     the fixtures); levenshtein is O(len²) per PAIR, so the blocking key
  *     — not the verify — is the scale lever. At 100 TB swap the prefix
  *     block for MinHash bands (functions/MinHashDedup) and keep this
  *     verify stage unchanged.
  */
object AnalyticsQueries extends QueryModule {

  /** doc_id → exploded non-empty whitespace tokens (the q_wordcount
    * tokenizer, kept identical to STRING_SPLIT(text,' ') + LENGTH>0). */
  private def tokens(s: org.apache.spark.sql.SparkSession, dir: String) =
    t(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)

  override def queries: Map[String, Q] = Map(
    // Per-document unigram token entropy (bits): H = log2(N) - Σ n·log2(n)/N
    // — a repetition/diversity quality signal (low entropy ⇒ boilerplate).
    "q_token_entropy" -> ((s, dir) => {
      tokens(s, dir)
        .groupBy("doc_id", "w").agg(count(lit(1)).as("n"))
        .groupBy("doc_id")
        .agg(
          sum(col("n")).as("n_toks"),
          pround4(log2(sum(col("n")).cast("double"))
            - sum(col("n").cast("double") * log2(col("n").cast("double")))
              / sum(col("n"))).as("entropy"))
        .orderBy("doc_id")
    }),

    // Unigram LM scoring (perplexity proxy): corpus unigram distribution →
    // per-doc mean log2 p(token). The LM side of quality filtering (docs
    // of improbable tokens score low). Vocab and corpus total broadcast.
    "q_unigram_logprob" -> ((s, dir) => {
      val tok = tokens(s, dir)
      val dw = tok.groupBy("doc_id", "w").agg(count(lit(1)).as("c_dw"))
      val vocab = tok.groupBy("w").agg(count(lit(1)).as("c_w"))
      val tot = vocab.agg(sum(col("c_w")).as("c_tot"))
      dw.join(broadcast(vocab), Seq("w"))
        .crossJoin(broadcast(tot))
        .groupBy("doc_id")
        .agg(
          sum(col("c_dw")).as("n_toks"),
          pround4(sum(col("c_dw").cast("double")
              * (log2(col("c_w").cast("double"))
                - log2(col("c_tot").cast("double"))))
            / sum(col("c_dw"))).as("avg_logprob"))
        .orderBy("doc_id")
    }),

    // Daily event-count anomaly detection: z-score of each (type, day)
    // count against that type's own daily distribution; |z| > 2 flags.
    // The flag is computed from the ROUNDED z on both sides.
    "q_event_anomaly" -> ((s, dir) => {
      val w = Window.partitionBy("event_type")
      // DATE-typed outputs diff as datetime.date vs Timestamp through
      // pandas — serialize to ISO string on both sides.
      t(s, dir, "events")
        .groupBy(col("event_type"),
          date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n"))
        .select(col("event_type"), col("day"), col("n"),
          pround4((col("n") - avg(col("n")).over(w))
            / stddev_samp(col("n")).over(w)).as("z"))
        .withColumn("is_anomaly", (abs(col("z")) > 2).cast("int"))
        .orderBy("event_type", "day")
    }),

    // Salted skew-proof join, proven equal to the plain join: per-user
    // first-seen cohort dim × event fact, fact salted by pmod(event_id, 8),
    // dim replicated ×8. The oracle runs the UNSALTED join — identical
    // output is the correctness contract of the rewrite.
    "q_join_skew_salt" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val dim = ev.groupBy("user_id")
        .agg(date_format(min(col("ts")), "yyyy-MM-dd").as("first_day"))
        .select(col("user_id"), col("first_day"),
          explode(sequence(lit(0), lit(7))).as("salt"))
      val fact = ev.select(col("user_id"), col("value"),
        pmod(col("event_id"), lit(8)).cast("int").as("salt"))
      fact.join(dim, Seq("user_id", "salt"))
        .groupBy("first_day")
        .agg(count(lit(1)).as("n_events"),
          pround4(sum(col("value").cast("decimal(18,4)")).cast("double"))
            .as("total_value"))
        .orderBy("first_day")
    }),

    // Edit-distance near-dup verification: block on (lang, 24-char prefix),
    // verify candidate pairs with integer-exact levenshtein ≤ 20. The
    // character-level member of the dedup family (catches small in-place
    // edits that token-set Jaccard dilutes).
    "q_editdist_pairs" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          substring(col("text"), 1, 24).as("blk"), col("text"))
      d.as("a").join(d.as("b"),
          col("a.lang") === col("b.lang") && col("a.blk") === col("b.blk")
            && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          levenshtein(col("a.text"), col("b.text")).cast("long").as("dist"))
        .filter(col("dist") <= 20)
        .orderBy("doc_a", "doc_b")
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "q_token_entropy" ->
      """WITH tok AS (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS w
        |    FROM documents),
        |c AS (SELECT doc_id, w, COUNT(*) AS n FROM tok
        |    WHERE LENGTH(w) > 0 GROUP BY doc_id, w)
        |SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_toks,
        |  FLOOR((LOG2(CAST(SUM(n) AS DOUBLE))
        |    - SUM(CAST(n AS DOUBLE) * LOG2(CAST(n AS DOUBLE))) / SUM(n))
        |    * 10000 + 0.5) / 10000 AS entropy
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_unigram_logprob" ->
      """WITH tok AS (SELECT doc_id, w FROM (SELECT doc_id,
        |    UNNEST(STRING_SPLIT(text, ' ')) AS w FROM documents)
        |    WHERE LENGTH(w) > 0),
        |dw AS (SELECT doc_id, w, COUNT(*) AS c_dw FROM tok
        |    GROUP BY doc_id, w),
        |vocab AS (SELECT w, COUNT(*) AS c_w FROM tok GROUP BY w),
        |tot AS (SELECT SUM(c_w) AS c_tot FROM vocab)
        |SELECT doc_id, CAST(SUM(c_dw) AS BIGINT) AS n_toks,
        |  FLOOR((SUM(CAST(c_dw AS DOUBLE)
        |      * (LOG2(CAST(c_w AS DOUBLE)) - LOG2(CAST(c_tot AS DOUBLE))))
        |    / SUM(c_dw)) * 10000 + 0.5) / 10000 AS avg_logprob
        |FROM dw JOIN vocab USING (w) CROSS JOIN tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_event_anomaly" ->
      """WITH d AS (SELECT event_type, STRFTIME(ts, '%Y-%m-%d') AS day,
        |    COUNT(*) AS n FROM events GROUP BY event_type, day),
        |z AS (SELECT event_type, day, n,
        |    FLOOR(((n - AVG(n) OVER w) / STDDEV_SAMP(n) OVER w)
        |      * 10000 + 0.5) / 10000 AS z
        |  FROM d WINDOW w AS (PARTITION BY event_type))
        |SELECT event_type, day, n, z,
        |  CAST(ABS(z) > 2 AS INT) AS is_anomaly
        |FROM z ORDER BY event_type, day""".stripMargin,

    "q_join_skew_salt" ->
      """WITH dim AS (SELECT user_id, STRFTIME(MIN(ts), '%Y-%m-%d')
        |      AS first_day
        |    FROM events GROUP BY user_id)
        |SELECT dim.first_day, COUNT(*) AS n_events,
        |  FLOOR(CAST(SUM(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE)
        |    * 10000 + 0.5) / 10000 AS total_value
        |FROM events e JOIN dim ON e.user_id = dim.user_id
        |GROUP BY dim.first_day ORDER BY dim.first_day""".stripMargin,

    "q_editdist_pairs" ->
      """SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  LEVENSHTEIN(a.text, b.text) AS dist
        |FROM documents a JOIN documents b
        |  ON a.lang = b.lang
        |  AND SUBSTRING(a.text, 1, 24) = SUBSTRING(b.text, 1, 24)
        |  AND a.doc_id < b.doc_id
        |WHERE LEVENSHTEIN(a.text, b.text) <= 20
        |ORDER BY doc_a, doc_b""".stripMargin
  )
}

package graft.operators

import graft.QueryModule
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators over `documents` — the remaining
  * training-data-pipeline stages: multi-rule quality filtering,
  * eval-set decontamination, sequence packing, and vocabulary/OOV
  * filtering.
  *
  * Determinism: every predicate is an integer×integer comparison
  * (`n_oov * 10 > n * 3` instead of a float-ratio threshold), so both
  * engines compare the exact same operands; doubles only appear at the
  * final portable ROUND.
  *
  *   - q_quality_filter: C4-style cascaded keep rules (min length, type-
  *     token ratio, stopword ratio) with a per-rule drop audit — the
  *     first failing rule claims the doc, so drop counts are disjoint and
  *     sum with n_kept back to n_docs. Per-row codegen + one bounded agg
  *     (5 langs); embarrassingly parallel at any scale.
  *   - q_decontaminate: 5-gram collision between train docs (doc_id >=
  *     10) and the eval set (doc_id < 10). Both sides explode to
  *     per-doc DISTINCT grams and meet in a key-equality join on the
  *     gram — the word-count shuffle plan (never a doc×doc product);
  *     at 100 TB hash the gram to a 64-bit key so the Exchange carries
  *     16 B/row, and broadcast the eval side (eval sets are tiny).
  *   - q_pack_sequences: streaming sequence packing — running token
  *     cumsum per source (ordered by the unique doc_id), bin =
  *     floor((cum-1)/256); docs straddling a boundary overflow into
  *     their starting bin (pack-then-split semantics). One window scan
  *     per source partition + one bounded agg; a skewed mega-source is
  *     the only 100× hazard (then: pre-split sources by hash salt).
  *   - q_vocab_oov: per-doc out-of-vocabulary rate against the corpus
  *     top-20 vocabulary. Vocabulary = bounded word-count agg (31
  *     distinct words here; cap keeps it bounded at any corpus size)
  *     joined back as a broadcast; keep decision is integer-exact.
  */
object PipelineQueries extends QueryModule {

  /** Shared with the streaming curation gate (StreamingCuration) — ONE
    * stopword list so the batch and stream quality rules cannot drift. */
  private[graft] val stopwords = Seq("data", "processing", "the", "and", "of")

  override def queries: Map[String, Q] = Map(
    "q_quality_filter" -> ((s, dir) => {
      val toks = split(col("text"), " ")
      val stopArr = array(stopwords.map(lit): _*)
      val base = t(s, dir, "documents").select(col("lang"),
        size(toks).as("n"),
        size(array_distinct(toks)).as("nu"),
        size(filter(toks, x => array_contains(stopArr, x))).as("ns"))
      val lenOk = col("n") >= 15
      val ttrOk = col("nu") * 10 >= col("n") * 3
      val stopOk = col("ns") * 8 <= col("n")
      base.groupBy("lang").agg(
          count(lit(1)).as("n_docs"),
          count(when(!lenOk, lit(1))).as("drop_len"),
          count(when(lenOk && !ttrOk, lit(1))).as("drop_ttr"),
          count(when(lenOk && ttrOk && !stopOk, lit(1))).as("drop_stop"),
          count(when(lenOk && ttrOk && stopOk, lit(1))).as("n_kept"))
        .orderBy("lang")
    }),

    "q_decontaminate" -> ((s, dir) =>
      contaminated(s, dir)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_hit_grams"))
        .orderBy("doc_id")),

    "q_pack_sequences" -> ((s, dir) => {
      val w = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "documents")
        .select(col("source"), col("doc_id"),
          size(split(col("text"), " ")).as("n"))
        .withColumn("cum", sum(col("n")).over(w))
        .withColumn("bin", floor((col("cum") - 1) / 256).cast("bigint"))
        .groupBy("source", "bin")
        .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("bin_toks"))
        .orderBy("source", "bin")
    }),

    // The capstone: the full curation pipeline composed END-TO-END and
    // still driver-gated — quality rules → drop non-canonical near-dup
    // cluster members (MinHash LSH → verify → connected components) →
    // drop eval-contaminated docs → pack survivors into 256-token bins.
    // Every stage is the same relation its standalone query uses; the
    // oracle composes the same CTEs (incl. the recursive closure). The
    // anti-joins are broadcasts of tiny drop lists; nothing in the
    // composition adds a corpus-wide shuffle beyond the stages' own.
    "q_curation_pipeline" -> ((s, dir) => {
      // the composition's own lever: tokenize the corpus ONCE (cheap
      // checkpoint of the token arrays) and feed the decontamination
      // 5-grams and the quality rules from it — the standalone stages
      // each pay their own tokenize, the pipeline doesn't have to
      // (the dedup stage no longer tokenizes at all: it reads the
      // persisted cluster artifact below)
      val toksRel = graft.functions.Materialize(t(s, dir, "documents")
        .repartition(col("doc_id"))
        .select(col("doc_id"), col("source"),
          split(col("text"), " ").as("t")))
      // near-dup survivor filter from the PERSISTED cluster artifact
      // (DedupQueries.persistedClusters): the pipeline consumes the
      // stored (id, cluster) relation instead of re-running shingle →
      // MinHash → band join → CC from raw text — the artifact is built
      // once per corpus and shared with q_dedup_cluster/q_split_leakage,
      // exactly what a deployment does (round-9 verdict task #1)
      val dupDrop = DedupQueries.persistedClusters(s, dir)
        .filter(col("id") =!= col("cluster"))
        .select(col("id").as("doc_id"))
      // same relation shape as contaminated(): per-doc distinct 5-gram
      // hits against the broadcast eval grams — read from the
      // write-once GramStore artifact (round-11; toksRel still feeds
      // the quality rules, which need whole token arrays)
      val grams5 = graft.functions.GramStore.grams5(s, dir)
      val ev = grams5.filter(col("doc_id") < 10).select("g").distinct()
      val contam = grams5.filter(col("doc_id") >= 10)
        .join(broadcast(ev), "g").select("doc_id").distinct()
      val stopArr = array(stopwords.map(lit): _*)
      val keepq = toksRel
        .select(col("doc_id"), col("source"), size(col("t")).as("n"),
          size(array_distinct(col("t"))).as("nu"),
          size(filter(col("t"), x => array_contains(stopArr, x))).as("ns"))
        .filter(col("n") >= 15 && col("nu") * 10 >= col("n") * 3 &&
          col("ns") * 8 <= col("n"))
      val curated = keepq
        .join(broadcast(dupDrop), Seq("doc_id"), "left_anti")
        .join(broadcast(contam), Seq("doc_id"), "left_anti")
      val w = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      curated
        .withColumn("cum", sum(col("n")).over(w))
        .withColumn("bin", floor((col("cum") - 1) / 256).cast("bigint"))
        .groupBy("source", "bin")
        .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("bin_toks"))
        .orderBy("source", "bin")
    }),

    // Leakage-safe train/val/test split: the md5 split draw is keyed by
    // the NEAR-DUP CLUSTER id (connected components over the LSH-verified
    // pairs), not the doc id — so a document and all its near-duplicates
    // land on the SAME side and eval can never score a paraphrase of a
    // training doc. Singleton docs (no near-dup) key by their own id.
    // ~80/10/10 by integer hex-threshold (205/25/26 of 256). The cluster
    // relation is the q_dedup_cluster plan; the split itself is a
    // scan-side codegen'd expression — no extra shuffle beyond the
    // cluster computation's own.
    "q_split_leakage" -> ((s, dir) => {
      // cluster labels from the persisted artifact (see
      // q_curation_pipeline's dupDrop comment) — the split rule is a
      // pure scan-side expression over the stored relation
      val labels = DedupQueries.persistedClusters(s, dir)
        .withColumnRenamed("id", "doc_id")
      val h = substring(
        md5(concat(lit("split"), col("cluster").cast("string"))
          .cast("binary")), 1, 2)
      t(s, dir, "documents").select(col("doc_id"))
        .join(labels, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster"), col("doc_id")).as("cluster"))
        .withColumn("split",
          when(h <= "cc", lit("train"))
            .when(h <= "e5", lit("val"))
            .otherwise(lit("test")))
        .orderBy("doc_id")
    }),

    "q_vocab_oov" -> ((s, dir) => {
      // served from the write-once TokenStore artifact (round-11): both
      // scans (vocabulary derivation, per-doc coverage) read the stored
      // (doc, w, tf) grain with occurrences re-weighted by tf — no
      // tokenize; the from-scratch oracle proves stored ≡ derived
      val tok = graft.functions.TokenStore.termFreq(s, dir)
      val vocab = tok.groupBy("w").agg(sum(col("tf")).as("c"))
        .orderBy(col("c").desc, col("w").asc).limit(20)
        .select(col("w"), lit(1).as("in_vocab"))
      tok.join(broadcast(vocab), Seq("w"), "left")
        .groupBy("doc_id")
        .agg(sum(col("tf")).as("n"),
          coalesce(sum(when(col("in_vocab").isNull, col("tf"))), lit(0L))
            .as("n_oov"))
        .select(col("doc_id"), col("n"), col("n_oov"),
          pround4(col("n_oov").cast("double") / col("n")).as("oov_ratio"),
          when(col("n_oov") * 10 <= col("n") * 3, lit(1)).otherwise(lit(0))
            .cast("int").as("keep"))
        .orderBy("doc_id")
    })
  )

  /** (doc_id, g) hits: one row per (train doc ≥ 10, 5-gram shared with
    * the eval set < 10). Per-doc distinct happens inside the row
    * (array_distinct before the explode): the same relation a
    * corpus-wide .distinct() yields, with no Exchange at all — only the
    * tiny eval-side cross-doc dedup shuffles.
    */
  /** The 100 TB path for [[contaminated]]: instead of broadcasting the
    * exact eval-gram SET, broadcast a Bloom filter of it and pre-screen
    * train grams SCAN-SIDE, so the exact equality join only receives
    * probable hits. The Bloom's size is fpp-bounded and independent of
    * the train corpus; false positives are removed by the exact join that
    * follows, so the result is IDENTICAL to the exact path (PipelineSpec
    * proves equality) — the filter only cuts the volume entering the
    * shuffle, which at 100 TB is the difference between shuffling every
    * train gram and shuffling ~|eval|·(1+fpp) of them.
    */
  private[graft] def contaminatedBloom(s: org.apache.spark.sql.SparkSession,
      dir: String, fpp: Double = 0.01): org.apache.spark.sql.DataFrame = {
    val grams = trainEvalGrams(s, dir)
    val ev = grams.filter(col("doc_id") < 10).select("g").distinct()
    val n = math.max(ev.count(), 1L) // bounded: eval sets are tiny
    val bloom = ev.stat.bloomFilter("g", n, fpp)
    val bc = s.sparkContext.broadcast(bloom)
    val mightHit = udf((g: String) => bc.value.mightContainString(g))
    grams.filter(col("doc_id") >= 10)
      .filter(mightHit(col("g"))) // scan-side cut; FPs survive to...
      .join(broadcast(ev), "g")   // ...the exact join, which removes them
  }

  private def contaminated(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val grams = trainEvalGrams(s, dir)
    val ev = grams.filter(col("doc_id") < 10).select("g").distinct()
    grams.filter(col("doc_id") >= 10).join(broadcast(ev), "g")
  }

  /** The raw per-doc-distinct (doc_id, g) 5-gram relation both
    * decontamination paths consume. */
  /** THE 5-gram rule — per-doc DISTINCT 5-token shingles of a
    * (doc_id, text) relation as exploded (doc_id, g) rows; docs under 5
    * tokens have no grams. One DataFrame-side implementation: the batch
    * decontamination paths AND the streaming arrival gate
    * (streaming/StreamingDecontaminate) build their grams here, so the
    * batch/stream parity contract can't drift on the gram rule.
    * explode_OUTER: see DedupQueries.simhashSigs — the inferred filter
    * would re-run the distinct-5-gram build below this projection;
    * size(t) >= 5 ⇒ at least one gram. */
  private[graft] def fiveGrams(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    fiveGramsFromToks(
      docs.select(col("doc_id"), split(col("text"), " ").as("t")))

  /** [[fiveGrams]] over an already-tokenized (doc_id, t) relation — the
    * composed pipeline tokenizes once and feeds every stage. */
  private[graft] def fiveGramsFromToks(toks: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    toks
      .select(col("doc_id"), col("t"))
      .filter(size(col("t")) >= 5)
      .select(col("doc_id"), explode_outer(
        graft.functions.WordGrams.grams(col("t"), 5, distinct = true))
        .as("g"))

  private def trainEvalGrams(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    // served from the write-once GramStore.gram5 artifact (round-11):
    // the tokenize + 5-gram HOF build runs once per corpus; both
    // consumers (the broadcast eval side and the train side of the hash
    // join) are plain scans of the stored narrow rows, and this query's
    // own from-scratch oracle proves stored ≡ derived per sweep. The
    // inline derivation lives on as [[fiveGrams]] (GramStore.buildGram5
    // is its verbatim twin) for non-fixture corpora and the streaming
    // gate.
    graft.functions.GramStore.grams5(s, dir)

  override def oracleSql: Map[String, String] = Map(
    "q_quality_filter" ->
      """WITH m AS (SELECT lang, STRING_SPLIT(text, ' ') AS toks
        |           FROM documents),
        |f AS (SELECT lang,
        |    LEN(toks) >= 15 AS len_ok,
        |    LEN(LIST_DISTINCT(toks)) * 10 >= LEN(toks) * 3 AS ttr_ok,
        |    LEN(LIST_FILTER(toks, x -> LIST_CONTAINS(
        |      ['data','processing','the','and','of'], x))) * 8
        |      <= LEN(toks) AS stop_ok
        |  FROM m)
        |SELECT lang, COUNT(*) AS n_docs,
        |  COUNT(*) FILTER (WHERE NOT len_ok) AS drop_len,
        |  COUNT(*) FILTER (WHERE len_ok AND NOT ttr_ok) AS drop_ttr,
        |  COUNT(*) FILTER (WHERE len_ok AND ttr_ok AND NOT stop_ok)
        |    AS drop_stop,
        |  COUNT(*) FILTER (WHERE len_ok AND ttr_ok AND stop_ok) AS n_kept
        |FROM f GROUP BY lang ORDER BY lang""".stripMargin,

    "q_decontaminate" ->
      """WITH toks AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS t
        |              FROM documents WHERE LEN(STRING_SPLIT(text, ' ')) >= 5),
        |grams AS (SELECT DISTINCT doc_id, UNNEST(LIST_TRANSFORM(
        |    RANGE(1, LEN(t) - 3), i -> ARRAY_TO_STRING(t[i : i + 4], ' ')))
        |    AS g FROM toks),
        |ev AS (SELECT DISTINCT g FROM grams WHERE doc_id < 10)
        |SELECT doc_id, COUNT(*) AS n_hit_grams
        |FROM grams JOIN ev USING (g) WHERE doc_id >= 10
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_pack_sequences" ->
      """WITH d AS (SELECT source, doc_id,
        |    LEN(STRING_SPLIT(text, ' ')) AS n FROM documents),
        |c AS (SELECT source, doc_id, n,
        |    SUM(n) OVER (PARTITION BY source ORDER BY doc_id
        |                 ROWS UNBOUNDED PRECEDING) AS cum FROM d)
        |SELECT source, CAST(FLOOR((cum - 1) / 256.0) AS BIGINT) AS bin,
        |  COUNT(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS bin_toks
        |FROM c GROUP BY source, bin ORDER BY source, bin""".stripMargin,

    "q_split_leakage" ->
      s"""WITH RECURSIVE ${DedupQueries.minhashCtes},
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs),
         |reach(a, b) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src),
         |labels AS (SELECT a AS doc_id, MIN(b) AS cluster FROM reach
         |  GROUP BY a),
         |wc AS (SELECT d.doc_id, COALESCE(l.cluster, d.doc_id) AS cluster
         |  FROM documents d LEFT JOIN labels l USING (doc_id)),
         |hx AS (SELECT doc_id, cluster,
         |    SUBSTRING(md5('split' || CAST(cluster AS VARCHAR)), 1, 2) AS h
         |  FROM wc)
         |SELECT doc_id, cluster,
         |  CASE WHEN h <= 'cc' THEN 'train'
         |       WHEN h <= 'e5' THEN 'val'
         |       ELSE 'test' END AS split
         |FROM hx ORDER BY doc_id""".stripMargin,

    "q_curation_pipeline" ->
      s"""WITH RECURSIVE ${DedupQueries.minhashCtes},
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs),
         |reach(a, b) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src),
         |labels AS (SELECT a AS id, MIN(b) AS cluster FROM reach GROUP BY a),
         |dup_drop AS (SELECT id FROM labels WHERE id <> cluster),
         |toks5 AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS t
         |  FROM documents WHERE LEN(STRING_SPLIT(text, ' ')) >= 5),
         |grams5 AS (SELECT DISTINCT doc_id, UNNEST(LIST_TRANSFORM(
         |    RANGE(1, LEN(t) - 3), i -> ARRAY_TO_STRING(t[i : i + 4], ' ')))
         |    AS g5 FROM toks5),
         |ev AS (SELECT DISTINCT g5 FROM grams5 WHERE doc_id < 10),
         |contam AS (SELECT DISTINCT grams5.doc_id FROM grams5
         |  JOIN ev USING (g5) WHERE grams5.doc_id >= 10),
         |q AS (SELECT doc_id, source, STRING_SPLIT(text, ' ') AS qt
         |  FROM documents),
         |keepq AS (SELECT doc_id, source, LEN(qt) AS n FROM q
         |  WHERE LEN(qt) >= 15
         |    AND LEN(LIST_DISTINCT(qt)) * 10 >= LEN(qt) * 3
         |    AND LEN(LIST_FILTER(qt, x -> LIST_CONTAINS(
         |      ['data','processing','the','and','of'], x))) * 8 <= LEN(qt)),
         |curated AS (SELECT k.doc_id, k.source, k.n FROM keepq k
         |  WHERE k.doc_id NOT IN (SELECT id FROM dup_drop)
         |    AND k.doc_id NOT IN (SELECT doc_id FROM contam)),
         |c AS (SELECT source, doc_id, n,
         |    SUM(n) OVER (PARTITION BY source ORDER BY doc_id
         |                 ROWS UNBOUNDED PRECEDING) AS cum FROM curated)
         |SELECT source, CAST(FLOOR((cum - 1) / 256.0) AS BIGINT) AS bin,
         |  COUNT(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS bin_toks
         |FROM c GROUP BY source, bin ORDER BY source, bin""".stripMargin,

    "q_vocab_oov" ->
      """WITH tok AS (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS w
        |             FROM documents),
        |vocab AS (SELECT w FROM (SELECT w, COUNT(*) AS c FROM tok
        |  GROUP BY w ORDER BY c DESC, w ASC LIMIT 20)),
        |oov AS (SELECT doc_id, COUNT(*) AS n,
        |    COUNT(*) FILTER (WHERE w NOT IN (SELECT w FROM vocab)) AS n_oov
        |  FROM tok GROUP BY doc_id)
        |SELECT doc_id, n, n_oov,
        |  FLOOR((CAST(n_oov AS DOUBLE) / n) * 10000 + 0.5) / 10000
        |    AS oov_ratio,
        |  CAST(CASE WHEN n_oov * 10 <= n * 3 THEN 1 ELSE 0 END AS INT)
        |    AS keep
        |FROM oov ORDER BY doc_id""".stripMargin
  )
}

package graft

import org.apache.spark.sql.{Column, SparkSession}

/** THE incremental-maintenance split convention, hoisted to one
  * definition (round-11 verdict task #6: the 80/20 predicate was
  * re-declared per family — DedupQueries, EvalQueries,
  * TextStatsQueries, RetrievalQueries — so a future fixture change
  * could silently diverge what "base" and "arriving batch" mean across
  * the six maintained ≡ rebuilt proofs).
  *
  * Every `*_incr` / `*_persist` query plays the same game: ids with
  * `id % 5 == 4` are the ARRIVING ~20% batch, the rest the standing
  * 80% base whose artifact persists write-once. Deterministic, so the
  * oracle-side rebuild and every re-run see the same split; modulo on
  * the id (not a hash) so the oracle SQL states it verbatim.
  */
object IncrementContract {

  /** True for rows of the arriving batch; `!isDelta(id)` is the
    * standing base. The ONE definition every incremental family uses. */
  def isDelta(id: Column): Column = id % 5 === 4

  // ---- the COMPACTION split (round-11 verdict task #1) -------------
  // The `*_compact` queries prove compacted ≡ rebuilt: a store built
  // from the FULL corpus is compacted by REMOVING isRemoved docs
  // (takedowns) and UPDATING isUpdated docs (delete+append of a
  // deterministically modified text), then graded against a
  // from-scratch oracle over the post-compaction corpus. One definition
  // here + one SQL twin below, so Spark side and DuckDB side cannot
  // drift.

  /** Documents deleted by the compaction proof (~10%). */
  def isRemoved(id: Column): Column = id % 10 === 0

  /** Documents updated by the compaction proof (~10%, disjoint from
    * [[isRemoved]]). */
  def isUpdated(id: Column): Column = id % 10 === 1

  /** The deterministic, SQL-expressible text update: append one token. */
  def updatedText(text: Column): Column =
    org.apache.spark.sql.functions.concat(text,
      org.apache.spark.sql.functions.lit(" xcompact"))

  /** DuckDB CTE body of the POST-COMPACTION corpus — the oracle twin of
    * [[isRemoved]]/[[isUpdated]]/[[updatedText]] (`||` concat matches
    * Spark's concat on the fixture's ASCII text). */
  val compactedCorpusSql: String =
    """SELECT doc_id, lang, source, text FROM documents
      | WHERE doc_id % 10 <> 0 AND doc_id % 10 <> 1
      | UNION ALL
      | SELECT doc_id, lang, source, text || ' xcompact' AS text
      | FROM documents WHERE doc_id % 10 = 1""".stripMargin

  /** Pre-build every incremental family's write-once base artifact —
    * the bench driver runs this BEFORE the timed sweep (round-11 advice
    * finding #5: building the base lazily inside the graded query
    * re-entangles the one-time build cost with the steady-state arrival
    * timing, the exact complaint IncrCcBench was split to fix). Returns
    * (family, seconds) lines; the bench artifact ships them as
    * `baseBuilds` so the write-once cost stays visible instead of
    * silently vanishing from the graded numbers. */
  def prebuildBases(s: SparkSession, dir: String): Seq[(String, Double)] = {
    // per-family isolation: one family's build failure must not abort
    // the rest (the unbuilt tail's one-time cost would land back inside
    // graded query medians) nor discard the completed families' lines —
    // a failure records -1 under a name carrying the error
    def timed(name: String)(body: => Unit): (String, Double) =
      try {
        val t0 = System.nanoTime()
        body
        (name, (System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          (s"$name-failed:" +
            Option(e.getMessage).getOrElse(e.getClass.getName).take(80),
            -1.0)
      }
    Seq(
      timed("dedup") { operators.DedupQueries.ensureIncBase(s, dir): Unit },
      timed("simhash") {
        operators.DedupQueries.ensureSimhashBase(s, dir): Unit
      },
      timed("lsh") { operators.EvalQueries.ensureLshBase(s, dir): Unit },
      timed("tokens") { functions.TokenStore.ensureIncBase(s, dir): Unit },
      timed("grams") { functions.GramStore.ensureIncBase(s, dir): Unit },
      timed("retrieval") {
        functions.RetrievalIndex.ensureIncBase(s, dir): Unit
      },
      timed("tokens_compact") {
        functions.TokenStore.ensureCompacted(s, dir): Unit
      },
      timed("retrieval_compact") {
        functions.RetrievalIndex.ensureCompacted(s, dir): Unit
      },
      timed("dedup_compact") {
        operators.DedupQueries.ensureCompactClusters(s, dir): Unit
      },
      timed("simhash_compact") {
        operators.DedupQueries.ensureSimhashCompact(s, dir): Unit
      },
      timed("lsh_compact") {
        operators.EvalQueries.ensureLshCompact(s, dir): Unit
      },
      timed("grams_compact") {
        functions.GramStore.ensureCompacted(s, dir): Unit
      })
  }
}

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

  /** Pre-build every incremental family's write-once base artifact —
    * the bench driver runs this BEFORE the timed sweep (round-11 advice
    * finding #5: building the base lazily inside the graded query
    * re-entangles the one-time build cost with the steady-state arrival
    * timing, the exact complaint IncrCcBench was split to fix). Returns
    * (family, seconds) lines; the bench artifact ships them as
    * `baseBuilds` so the write-once cost stays visible instead of
    * silently vanishing from the graded numbers. */
  def prebuildBases(s: SparkSession, dir: String): Seq[(String, Double)] = {
    def timed(name: String)(body: => Unit): (String, Double) = {
      val t0 = System.nanoTime()
      body
      (name, (System.nanoTime() - t0) / 1e9)
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
      })
  }
}

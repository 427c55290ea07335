package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative BPE merge trainer (round-6 verdict item #6) — the
  * tokenizer-training primitive the LLM-pipeline brief implies,
  * generalizing the single q_bpe_merge round into an N-round loop.
  *
  * Each round is the q_bpe_merge plan (operators/TextPipelineQueries):
  *   1. count ADJACENT token pairs corpus-wide — the word-count plan:
  *      in-row pair generation, map-side partial agg, ONE shuffle whose
  *      key cardinality is the pair vocabulary (not the corpus);
  *   2. argmax (count desc, then lexicographic pair asc — fully
  *      deterministic) via a 1-row TakeOrdered — the collected row is the
  *      round's merge rule, the bounded-driver-action exception
  *      (N rounds × 1 row total);
  *   3. apply the merge corpus-wide as a literal-quoted regex replace —
  *      leading space consumed, trailing space matched by a LOOKAHEAD so
  *      it survives as the next occurrence's delimiter: exactly BPE's
  *      greedy left-to-right scan ("a b a b" → "a_b a_b" in ONE pass;
  *      a consuming trailing space would skip every second consecutive
  *      occurrence — the round-7 advice bug). `Pattern.quote` keeps
  *      regex-special tokens literal. DuckDB's RE2 has no lookahead, so
  *      the oracle twin replays the SAME greedy scan as a list_reduce
  *      over the token list — different mechanism, identical semantics.
  *
  * Per-round budget: one pair-count shuffle + one embarrassingly-parallel
  * regex map. Lineage is cut every `checkpointEvery` rounds (each round
  * stacks a regexp_replace projection; at hundreds of merges the plan
  * would otherwise grow unboundedly and re-run all prior merges on every
  * action). Stops early when no pair reaches `minCount`.
  */
object BpeTrainer {

  /** One learned merge rule: round (1-based), the winning pair, and its
    * corpus-wide occurrence count at the time of the merge. */
  case class MergeStep(round: Int, pair: String, count: Long)

  /** Adjacent-pair relation of the current corpus: one row per occurrence
    * (NOT per-doc distinct — BPE counts occurrences). */
  private def pairCounts(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(split(col(textCol), " ").as("t"))
      .filter(size(col("t")) >= 2)
      // explode the POSITION sequence (integers) and build the pair
      // string with a plain projection in the same codegen stage — the
      // q_char_trigrams discipline; the transform-lambda flavor ran one
      // INTERPRETED concat lambda per position per round (r13 A/B:
      // 1.16× the CPU of this form on q_bpe_train). explode_OUTER so no
      // size(sequence) filter is inferred; size ≥ 2 makes the position
      // array non-empty, so row sets are identical.
      .select(col("t"),
        explode_outer(sequence(lit(1), size(col("t")) - 1)).as("i"))
      .select(concat(element_at(col("t"), col("i")), lit(" "),
        element_at(col("t"), col("i") + 1)).as("p"))
      .groupBy("p").agg(count(lit(1)).as("c"))

  /** Apply one merge rule to a text column: greedy left-to-right scan via
    * a literal-quoted regex whose trailing delimiter is a LOOKAHEAD
    * (non-consuming), so consecutive occurrences all merge in one pass
    * ("a b a b" → "a_b a_b") while overlapping ones stay non-overlapping
    * ("a a a" with pair "a a" → "a_a a") — BPE's merge rule exactly.
    * The merged token joins with '_'. */
  def applyMerge(text: org.apache.spark.sql.Column, pair: String)
      : org.apache.spark.sql.Column = {
    val pattern = " " + java.util.regex.Pattern.quote(pair) + "(?= )"
    val repl = java.util.regex.Matcher
      .quoteReplacement(" " + pair.replace(' ', '_'))
    trim(regexp_replace(concat(lit(" "), text, lit(" ")), lit(pattern), lit(repl)))
  }

  /** Train `rounds` merges over `docs(textCol)`. Returns the merged
    * corpus (same schema, textCol rewritten) and the learned merge
    * sequence in order. `onRound` observes (step, seconds) per round —
    * the BpeBench per-round-cost hook. */
  def train(docs: DataFrame, textCol: String, rounds: Int,
            minCount: Long = 1L, checkpointEvery: Int = 8,
            onRound: (MergeStep, Double) => Unit = (_, _) => ())
      : (DataFrame, Seq[MergeStep]) = {
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    require(checkpointEvery >= 1, s"checkpointEvery must be >= 1, got $checkpointEvery")
    // spread a single-task input once up front: every round's pair count
    // and merge rewrite inherit the parallelism (a 1-row-group parquet
    // corpus otherwise trains on ONE thread for all rounds)
    var cur = Materialize.spread(docs)
    val steps = Seq.newBuilder[MergeStep]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val t0 = System.nanoTime()
      val best = pairCounts(cur, textCol)
        .orderBy(col("c").desc, col("p").asc).limit(1).collect()
      if (best.isEmpty || best(0).getLong(1) < minCount) exhausted = true
      else {
        val pair = best(0).getString(0)
        val step = MergeStep(r, pair, best(0).getLong(1))
        steps += step
        cur = cur.withColumn(textCol, applyMerge(col(textCol), pair))
        if (r % checkpointEvery == 0) cur = Materialize(cur)
        onRound(step, (System.nanoTime() - t0) / 1e9)
      }
      r += 1
    }
    (cur, steps.result())
  }

  /** Padded-substring predicate: does the doc contain the pair as
    * ADJACENT tokens? Exactly the rows [[applyMerge]] can change. */
  private def containsPair(text: org.apache.spark.sql.Column, pair: String)
      : org.apache.spark.sql.Column =
    concat(lit(" "), text, lit(" ")).contains(" " + pair + " ")

  /** [[train]] with DELTA pair recounting (round-8 verdict task #5) —
    * the fix for naive BPE's per-round wall: [[train]] re-shuffles the
    * FULL pair vocabulary every round (cost ∝ corpus × rounds), but a
    * merge only changes documents that actually CONTAIN the winning pair
    * — a fast-shrinking fraction as training walks down the frequency
    * curve. This variant keeps the standing pair-count relation
    * materialized and, per round, recounts ONLY the affected documents:
    *   counts' = counts − pairs(affected_before) + pairs(affected_after)
    * (one re-aggregation over counts ∪ delta — vocabulary-sized, tiny
    * next to a corpus recount — then filter c > 0). The argmax and merge
    * application are unchanged, so trainDelta ≡ train step for step and
    * byte for byte (spec-pinned); only the counting plan differs.
    * After merge 1 the per-round cost falls with the affected-doc count
    * (BpeBench measures the curve); at rounds in the hundreds this is
    * the difference between a trainer and a toy. */
  def trainDelta(docs: DataFrame, textCol: String, rounds: Int,
                 minCount: Long = 1L, checkpointEvery: Int = 8,
                 onRound: (MergeStep, Double) => Unit = (_, _) => ())
      : (DataFrame, Seq[MergeStep]) = {
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    require(checkpointEvery >= 1, s"checkpointEvery must be >= 1, got $checkpointEvery")
    val steps = Seq.newBuilder[MergeStep]
    var cur = Materialize.spread(docs) // see train()
    if (rounds > 0) {
      // round 1 pays the one full corpus count; every later round pays
      // only its affected slice + a vocabulary-sized re-aggregation
      var counts = Materialize(pairCounts(docs, textCol))
      var r = 1
      var exhausted = false
      while (r <= rounds && !exhausted) {
        val t0 = System.nanoTime()
        val best = counts.orderBy(col("c").desc, col("p").asc)
          .limit(1).collect()
        if (best.isEmpty || best(0).getLong(1) < minCount) exhausted = true
        else {
          val pair = best(0).getString(0)
          val step = MergeStep(r, pair, best(0).getLong(1))
          steps += step
          if (r < rounds) {
            val affected = Materialize(
              cur.filter(containsPair(col(textCol), pair)))
            val after = affected
              .withColumn(textCol, applyMerge(col(textCol), pair))
            val delta = pairCounts(affected, textCol)
              .select(col("p"), (-col("c")).as("c"))
              .unionAll(pairCounts(after, textCol))
            counts = Materialize(counts.unionAll(delta)
              .groupBy("p").agg(sum(col("c")).as("c"))
              .filter(col("c") > 0))
          }
          cur = cur.withColumn(textCol, applyMerge(col(textCol), pair))
          if (r % checkpointEvery == 0) cur = Materialize(cur)
          onRound(step, (System.nanoTime() - t0) / 1e9)
        }
        r += 1
      }
    }
    (cur, steps.result())
  }

  /** Tokenizer INFERENCE: apply a learned merge sequence, in training
    * order, to new text — the other half of the BPE story ([[train]]
    * learns the rules once; this replays them over any corpus). Each
    * rule is the same literal-quoted global replace training used, so
    * tokenize(trainCorpus) reproduces train's merged corpus exactly.
    * Embarrassingly parallel (a stack of |merges| regex projections,
    * zero shuffle); for merge tables in the hundreds, cut lineage every
    * ~8 applications like train does. */
  def tokenize(text: org.apache.spark.sql.Column, merges: Seq[MergeStep])
      : org.apache.spark.sql.Column =
    merges.sortBy(_.round).foldLeft(text)((t, m) => applyMerge(t, m.pair))

  /** The merge sequence as a relation (round, pair, pair_count) — the
    * oracle-comparable artifact of a training run. */
  def mergesDf(spark: SparkSession, steps: Seq[MergeStep]): DataFrame = {
    import spark.implicits._
    steps.map(m => (m.round, m.pair, m.count))
      .toDF("round", "pair", "pair_count")
  }
}

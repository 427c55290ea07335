package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra–Gries heavy-hitters sketch (SURVEY.md §2.3 K) and the two-pass
  * EXACT frequent-items query built on it.
  *
  * Why a sketch: at 100 TB, `groupBy(token).count` shuffles one state row
  * per DISTINCT token — fine for a bounded vocabulary, quadrillion-row
  * disaster for open-ended keys (URLs, user ids, n-grams). The MG summary
  * is a fixed k-counter state: each partition ships AT MOST k (item, count)
  * pairs regardless of input size, and merge is associative/commutative, so
  * Spark partial-aggregates map-side exactly like a built-in agg.
  *
  * Guarantees (public results — Misra & Gries 1982; merge form from
  * Agarwal et al., "Mergeable Summaries", PODS 2012):
  *   - every item with true count  c > n/(k+1)  is present in the summary;
  *   - each reported count is a lower bound, short by at most n/(k+1).
  *
  * The summary alone is approximate, so it is NOT oracle-comparable; the
  * oracle-gated form is [[exactHeavyHitters]]: pass 1 computes (n, summary)
  * in ONE scan, pass 2 exact-counts ONLY the ≤ k candidate items (broadcast
  * `InSet` filter, so the second shuffle is candidate-bounded) and applies
  * the exact threshold. Because the summary provably contains every item
  * above threshold, the final answer equals the exact
  * `HAVING count * denom > n` — integer math on both engines, no float
  * threshold drift.
  */
object HeavyHitters {

  /** MG state: at most k counters. `k` rides the buffer so merge sites
    * don't need a second channel for it. */
  case class MGBuf(k: Int, counts: Map[String, Long])

  private def decrementAll(m: Map[String, Long], d: Long): Map[String, Long] =
    if (d <= 0) m
    else m.iterator
      .map { case (w, c) => (w, c - d) }
      .filter(_._2 > 0)
      .toMap

  /** One MG update: increment if tracked, adopt if a slot is free, else
    * decrement every counter (the classic "cancel k+1 distinct items"
    * step — each such step accounts ≤ n/(k+1) total error).
    * Package-visible: the streaming twin folds batches with it. */
  private[graft] def update(b: MGBuf, w: String): MGBuf =
    b.counts.get(w) match {
      case Some(c) => b.copy(counts = b.counts.updated(w, c + 1))
      case None if b.counts.size < b.k => b.copy(counts = b.counts.updated(w, 1L))
      case None => b.copy(counts = decrementAll(b.counts, 1L))
    }

  /** Mergeable-summaries combine: add counts, then if over k counters
    * subtract the (k+1)-th largest value from all (drops it and everything
    * below to ≤ 0) — the error added is exactly that subtracted value,
    * keeping the global n/(k+1) bound. */
  private def mergeBufs(a: MGBuf, b: MGBuf): MGBuf = {
    val k = math.max(a.k, b.k)
    val sum = b.counts.foldLeft(a.counts) { case (m, (w, c)) =>
      m.updated(w, m.getOrElse(w, 0L) + c)
    }
    if (sum.size <= k) MGBuf(k, sum)
    else {
      // (k+1)-th largest count; values.length > k here
      val d = sum.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      MGBuf(k, decrementAll(sum, d))
    }
  }

  def aggregator(k: Int): Aggregator[String, MGBuf, Map[String, Long]] = {
    require(k > 0, s"misra_gries: k must be positive, got $k")
    new Aggregator[String, MGBuf, Map[String, Long]] {
      override def zero: MGBuf = MGBuf(k, Map.empty)
      override def reduce(b: MGBuf, w: String): MGBuf =
        if (w == null) b else update(b, w)
      override def merge(a: MGBuf, b: MGBuf): MGBuf = mergeBufs(a, b)
      override def finish(r: MGBuf): Map[String, Long] = r.counts
      // product encoder: buffer serializes only at the partial/final
      // exchange (ScalaAggregator is a TypedImperativeAggregate — the
      // in-partition object is updated without a per-row round-trip)
      override def bufferEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
      override def outputEncoder: Encoder[Map[String, Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    }
  }

  /** `misra_gries(col, k)` as an untyped aggregation column; returns the
    * summary as `map<string,bigint>` of lower-bound counts. */
  def misraGries(c: Column, k: Int): Column =
    udaf(aggregator(k), Encoders.STRING).apply(c)

  /** EXACT frequent items: all values of `colName` whose count `c`
    * satisfies `c * denom > n` (i.e. frequency strictly above 1/denom),
    * with exact counts, as columns (`colName`, `cnt`). `n` counts NON-NULL
    * values of `colName` only — null is never a candidate item, so
    * including null rows would silently deflate every item's frequency on
    * a nullable column.
    *
    * Two scans total: (1) one pass computing n and the MG summary with
    * k = denom counters — guarantee above makes the summary a superset of
    * the answer; (2) exact counts restricted to the ≤ denom candidates.
    * Driver state is the ≤ denom-entry summary (bounded by construction —
    * this is the documented exception to the no-collect rule). The final
    * result is merge-order-independent: candidates are a superset
    * regardless of how partitions merged, and the exact pass prunes every
    * false candidate. */
  def exactHeavyHitters(df: DataFrame, colName: String, denom: Int): DataFrame = {
    require(denom > 0, s"exactHeavyHitters: denom must be positive, got $denom")
    val first = df.agg(
      count(col(colName)).as("n"),
      misraGries(col(colName), denom).as("mg")).head()
    val n = first.getLong(0)
    val candidates = first.getMap[String, Long](1).keys.toSeq
    if (candidates.isEmpty) {
      df.sparkSession.emptyDataFrame
        .withColumn(colName, lit(null).cast("string"))
        .withColumn("cnt", lit(null).cast("long"))
        .limit(0)
    } else {
      df.filter(col(colName).isInCollection(candidates))
        .groupBy(colName)
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * denom > lit(n))
    }
  }
}

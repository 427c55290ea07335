package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch PSI drift monitor
  * (`operators/QualityQueries.q_psi_drift`): per source, maintain the
  * 10-bucket n_chars histogram of everything seen so far and emit the
  * live Population Stability Index against a FIXED reference histogram
  * each micro-batch — how production drift monitors actually run: the
  * reference is the distribution the model was trained on (here: the
  * batch corpus histogram), arrivals score against it continuously, and
  * an alert fires when PSI crosses the gate.
  *
  * The histogram is a MERGEABLE aggregation state (bucket counts add),
  * so when the reference equals the stream's own corpus histogram the
  * final per-source PSI is BIT-identical to q_psi_drift's batch answer —
  * StreamingSpec pins that parity, term-for-term through the same
  * Laplace smoothing, ln, ×10¹⁴ scaling, and portable round.
  *
  * 100 TB lens: state per source is 10 longs regardless of stream
  * length; the source key partitions the stream; bucket histograms from
  * sharded monitors merge by vector addition for a two-level topology.
  */
object StreamingDrift {

  case class DocLen(source: String, n_chars: Int)
  case class PsiEstimate(source: String, n_docs: Long, psi: Double)

  val Buckets = 10
  val Width = 64

  /** The batch query's bucket rule: least(n_chars DIV 64, 9). Clamped at
    * 0 so an invalid negative length degrades (bucket 0) instead of
    * crashing the monitor — batch parity is only contracted for valid
    * (non-negative) lengths. */
  private[graft] def bucket(nChars: Int): Int =
    math.min(math.max(nChars, 0) / Width, Buckets - 1)

  /** PSI of a source histogram vs the reference — arithmetic is the
    * batch query term-for-term: Laplace (cnt+0.5)/(n+5.0) shares, ln of
    * the ratio, terms scaled to BIGINTs before summing, portable round.
    * `ref` has Buckets entries; its total is derived. */
  private[graft] def psi(hist: Array[Long], ref: Array[Long]): Double = {
    require(ref.length == Buckets, s"reference needs $Buckets buckets")
    val n = hist.sum
    val nAll = ref.sum
    var acc = 0L
    var b = 0
    while (b < Buckets) {
      val p = (hist(b) + 0.5) / (n + Buckets * 0.5)
      val q = (ref(b) + 0.5) / (nAll + Buckets * 0.5)
      acc += math.floor((p - q) * math.log(p / q) * 1e14 + 0.5).toLong
      b += 1
    }
    math.floor(acc.toDouble / 1e14 * 10000 + 0.5) / 10000
  }

  /** Per-source streaming PSI against the broadcast reference histogram
    * (update mode): each micro-batch emits the source's current
    * (n_docs, psi). */
  def psiDrift(spark: SparkSession, ds: Dataset[DocLen],
               ref: Array[Long]): Dataset[PsiEstimate] = {
    import spark.implicits._
    require(ref.length == Buckets, s"reference needs $Buckets buckets")
    ds.groupByKey(_.source)
      .flatMapGroupsWithState[Array[Long], PsiEstimate](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (source: String, rows: Iterator[DocLen],
         state: GroupState[Array[Long]]) =>
          val hist =
            if (state.exists) state.get else Array.fill(Buckets)(0L)
          rows.foreach(d => hist(bucket(d.n_chars)) += 1)
          state.update(hist)
          Iterator.single(PsiEstimate(source, hist.sum, psi(hist, ref)))
      }
  }
}

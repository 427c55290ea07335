package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch Poisson-bootstrap CI
  * (`operators/InferenceQueries.q_bootstrap_ci`): per language, maintain
  * the B=32 replicate weighted sums (Σw·x, Σw) plus the point-estimate
  * sums (n, Σx). Poisson bootstrap state is MERGEABLE BY CONSTRUCTION —
  * each arriving doc adds w_b·x to replicate b, where w_b is the same
  * deterministic integer-threshold draw the batch query makes from
  * md5(doc_id:b) — so the streaming state IS the batch query's (lang, b)
  * aggregation state, and the final emission agrees with the batch CI
  * over the same doc multiset (StreamingSpec pins the parity).
  *
  * This is WHY Poisson bootstrap is the streaming-era bootstrap
  * [Chamandy et al. 2012]: resample-by-index needs the finished corpus;
  * per-row independent weights need only the row, once, in any order,
  * across any micro-batch boundaries or replays (same doc → same
  * weights → idempotent per-doc contribution under exactly-once input).
  *
  * State per key is fixed: 2 longs + 2×B longs (≈ 0.5 KB at B = 32),
  * regardless of stream length — no TTL needed. The same state merges
  * across shards by vector addition, so a two-level shard-then-merge
  * topology works unchanged.
  */
object StreamingBootstrap {

  case class DocArrival(lang: String, docId: Long, nChars: Long)
  case class BootCi(lang: String, n: Long, mean_chars: Double,
                    boot_se: Double, ci_lo: Double, ci_hi: Double)
  case class BootState(n: Long, sx: Long, swx: Array[Long], sw: Array[Long])

  /** Shared with the batch query — the parity contract's second constant
    * (the first, PoissonT, was already shared). */
  val B: Int = graft.operators.InferenceQueries.B

  private def round4(x: Double): Double = math.floor(x * 10000 + 0.5) / 10000

  /** Poisson(1) weight for (docId, replicate b): the batch query's exact
    * integer-threshold compare on the 48-bit md5 of "docId:b". */
  private[graft] def weight(docId: Long, b: Int): Long = {
    val hv = StreamingSketch.hv48(s"$docId:$b")
    val i = graft.operators.InferenceQueries.PoissonT.indexWhere(hv < _)
    if (i < 0) 6L else i.toLong
  }

  private[graft] def fold(st: BootState, docs: Iterator[DocArrival]): BootState = {
    var n = st.n; var sx = st.sx
    val swx = st.swx.clone(); val sw = st.sw.clone()
    docs.foreach { d =>
      n += 1; sx += d.nChars
      var b = 1
      while (b <= B) {
        val w = weight(d.docId, b)
        swx(b - 1) += w * d.nChars; sw(b - 1) += w
        b += 1
      }
    }
    BootState(n, sx, swx, sw)
  }

  /** The batch query's emission arithmetic: replicate means as exact
    * BIGINT ratios, sample stddev over the ≤B means, mean ± 1.96·se. */
  private[graft] def emit(lang: String, st: BootState): BootCi = {
    val rms = (0 until B).flatMap { i =>
      if (st.sw(i) > 0) Some(st.swx(i).toDouble / st.sw(i)) else None
    }
    val m = st.sx.toDouble / st.n
    val rmMean = rms.sum / rms.length
    val se =
      if (rms.length < 2) Double.NaN
      else math.sqrt(rms.map(v => (v - rmMean) * (v - rmMean)).sum
        / (rms.length - 1))
    BootCi(lang, st.n, round4(m), round4(se),
      round4(m - 1.96 * se), round4(m + 1.96 * se))
  }

  /** Per-language streaming bootstrap CIs (update mode): each micro-batch
    * emits the language's current (n, mean, se, ci). */
  def bootstrapCi(spark: SparkSession,
                  ds: Dataset[DocArrival]): Dataset[BootCi] = {
    import spark.implicits._
    ds.groupByKey(_.lang)
      .flatMapGroupsWithState[BootState, BootCi](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (lang: String, rows: Iterator[DocArrival],
         state: GroupState[BootState]) =>
          val prev = if (state.exists) state.get
            else BootState(0L, 0L, Array.fill(B)(0L), Array.fill(B)(0L))
          val next = fold(prev, rows)
          state.update(next)
          if (next.n == 0) Iterator.empty
          else Iterator.single(emit(lang, next))
      }
  }
}

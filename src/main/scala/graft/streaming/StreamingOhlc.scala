package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch OHLC downsample
  * (`operators/TimeSeriesQueries.q_ohlc`): per (event_type, day), maintain
  * the running (open, high, low, close, n) — the live candlestick.
  * OHLC state is MERGEABLE: first/last resolve by the total order
  * (ts_us, event_id) — the batch query's exact tie rule — and min/max/count
  * are plain semilattice folds, so arrival order, micro-batch boundaries,
  * and shard merges cannot change the bar (StreamingSpec pins parity
  * against q_ohlc over the same events).
  *
  * State per key is 7 numbers + 2 order keys — fixed size; keys are
  * (type, day) so state count is calendar × alphabet bounded and old
  * days stop updating on their own (no TTL needed for correctness;
  * production would add a watermark-driven eviction for state size).
  */
object StreamingOhlc {

  case class TickArrival(eventType: String, day: String, tsUs: Long,
                         eventId: Long, value: Double)
  case class OhlcBar(event_type: String, day: String, n: Long,
                     open: Double, high: Double, low: Double, close: Double)
  case class OhlcState(firstUs: Long, firstId: Long, open: Double,
                       high: Double, low: Double,
                       lastUs: Long, lastId: Long, close: Double, n: Long)

  private def round4(x: Double): Double = math.floor(x * 10000 + 0.5) / 10000

  private[graft] def fold(st: Option[OhlcState],
                          rows: Iterator[TickArrival]): Option[OhlcState] = {
    var s = st.orNull
    rows.foreach { r =>
      if (s == null) {
        s = OhlcState(r.tsUs, r.eventId, r.value, r.value, r.value,
          r.tsUs, r.eventId, r.value, 1L)
      } else {
        val first =
          if (r.tsUs < s.firstUs ||
            (r.tsUs == s.firstUs && r.eventId < s.firstId))
            (r.tsUs, r.eventId, r.value)
          else (s.firstUs, s.firstId, s.open)
        val last =
          if (r.tsUs > s.lastUs ||
            (r.tsUs == s.lastUs && r.eventId > s.lastId))
            (r.tsUs, r.eventId, r.value)
          else (s.lastUs, s.lastId, s.close)
        s = OhlcState(first._1, first._2, first._3,
          math.max(s.high, r.value), math.min(s.low, r.value),
          last._1, last._2, last._3, s.n + 1L)
      }
    }
    Option(s)
  }

  /** Live per-(type, day) bars (update mode): each micro-batch emits the
    * touched keys' current bar. */
  def ohlc(spark: SparkSession,
           ds: Dataset[TickArrival]): Dataset[OhlcBar] = {
    import spark.implicits._
    ds.groupByKey(r => (r.eventType, r.day))
      .flatMapGroupsWithState[OhlcState, OhlcBar](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: (String, String), rows: Iterator[TickArrival],
         state: GroupState[OhlcState]) =>
          val next = fold(if (state.exists) Some(state.get) else None, rows)
          next match {
            case Some(s) =>
              state.update(s)
              Iterator.single(OhlcBar(key._1, key._2, s.n,
                round4(s.open), round4(s.high), round4(s.low),
                round4(s.close)))
            case None => Iterator.empty
          }
      }
  }
}

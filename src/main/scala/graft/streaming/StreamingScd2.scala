package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch Type-2 dimension-history builder
  * (`operators/TemporalQueries.q_scd2`): per user, maintain the OPEN
  * history row (current state, version, valid_from, event count) and, on
  * every state change, emit the closed row plus the new open row — the
  * standard streaming-CDC → SCD2 materialization. Update-mode semantics:
  * downstream upserts by (user_id, version), so the last emission per
  * key IS the final history row, and StreamingSpec pins the fixpoint
  * equal to the batch q_scd2 relation row-for-row.
  *
  * Ordering contract: events must arrive per-key in (ts, event_id)
  * order ACROSS batches (the usual CDC-source guarantee — a keyed log
  * is per-key ordered); within a batch any order is fine (the group
  * iterator is sorted here). A production variant facing out-of-order
  * event time buffers per key up to the watermark before folding —
  * the EventTimeHeavyHitterProcessor pattern; the fold below is
  * unchanged by that refinement.
  *
  * 100 TB lens: state per user is ONE small struct (current run only —
  * closed rows leave state the moment they're emitted), so state size
  * tracks live entities, not stream length; the grouping key partitions
  * the stream and nothing else shuffles.
  */
object StreamingScd2 {

  case class Scd2Event(user_id: Long, ts_us: Long, event_id: Long,
                       event_type: String)

  /** One history row; valid_to_us == None marks the open (current) row. */
  case class Scd2Row(user_id: Long, version: Long, state: String,
                     valid_from_us: Long, valid_to_us: Option[Long],
                     is_current: Int, n_events: Long)

  /** Per-key state: the single open run (closed rows leave the store). */
  case class OpenRun(state: String, version: Long,
                     validFromUs: Long, nEvents: Long)

  /** Incremental SCD2 maintenance (update mode): emits every history row
    * touched by the micro-batch — closed rows exactly once, the open row
    * re-emitted whenever its count or identity changes. */
  def scd2(spark: SparkSession, ds: Dataset[Scd2Event]): Dataset[Scd2Row] = {
    import spark.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenRun, Scd2Row](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[Scd2Event], state: GroupState[OpenRun]) =>
          val ordered = rows.toSeq.sortBy(e => (e.ts_us, e.event_id))
          var cur = if (state.exists) Option(state.get) else None
          val out = Seq.newBuilder[Scd2Row]
          ordered.foreach { e =>
            cur match {
              case Some(run) if run.state == e.event_type =>
                cur = Some(run.copy(nEvents = run.nEvents + 1))
              case Some(run) => // close the run, open the next version
                out += Scd2Row(user, run.version, run.state,
                  run.validFromUs, Some(e.ts_us), 0, run.nEvents)
                cur = Some(OpenRun(e.event_type, run.version + 1, e.ts_us, 1L))
              case None =>
                cur = Some(OpenRun(e.event_type, 1L, e.ts_us, 1L))
            }
          }
          cur match {
            case Some(run) if ordered.nonEmpty =>
              state.update(run)
              out += Scd2Row(user, run.version, run.state, run.validFromUs,
                None, 1, run.nEvents)
            case _ => () // empty batch for this key — nothing changed
          }
          out.result().iterator
      }
  }
}

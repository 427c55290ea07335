package graft.streaming

import graft.functions.{RetrievalIndex, TokenStore}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous TAKEDOWN maintenance of the persisted stores — the delete
  * twin of StreamingTokens/StreamingRetrieval (round-12: a living
  * corpus's removal feed — takedown requests, licensing revocations,
  * contamination discoveries — arrives as a stream just like its
  * documents do). Every micro-batch of doc ids compacts the store
  * through the touched-files rewrite (CompactStore): the REWRITE is ∝
  * the files physically holding the removed rows, and the locate step
  * pushes takedown-sized batches down as a literal id filter so
  * parquet row-group statistics skip non-matching row groups (on an
  * id-clustered layout, whole files). Batch removal feeds upstream
  * when arrival rates are high — each micro-batch pays one locate pass.
  *
  * Unlike the APPEND maintainers, deletions need NO exactly-once
  * ledger: removing an already-removed id finds no touched file and
  * no-ops, so at-least-once replay is idempotent by the operation's own
  * algebra (removal is idempotent under repetition) — the checkpoint's
  * native guarantee suffices, and there is no batch-id ↔ store epoch to
  * bind. The composition holds zero streaming state (foreachBatch over
  * a stateless batch transform).
  *
  * SINGLE WRITER per store: the per-batch compaction takes the store's
  * `_writer.lock`, so a takedown stream and a batch appender must not
  * run concurrently on one artifact (schedule removal feeds and append
  * feeds through one maintainer or alternate them — the same contract
  * every batch mutator documents).
  */
object StreamingTakedown {

  /** Apply every arriving micro-batch of removal doc ids to the
    * TokenStore at `storePath` (ids in the stream's FIRST column). */
  def maintainTokenStore(removals: DataFrame, storePath: String,
                         checkpointDir: String): StreamingQuery =
    removals.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) TokenStore.compactRemove(storePath, batch)
      }
      .start()

  /** Apply every arriving micro-batch of removal doc ids to the
    * RetrievalIndex at `indexPath`. */
  def maintainRetrievalIndex(removals: DataFrame, indexPath: String,
                             checkpointDir: String): StreamingQuery =
    removals.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) RetrievalIndex.compactRemove(indexPath, batch)
      }
      .start()
}

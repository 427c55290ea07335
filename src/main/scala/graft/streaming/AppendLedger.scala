package graft.streaming

import org.apache.spark.sql.DataFrame

/** EXACTLY-ONCE parquet append for foreachBatch maintenance sinks.
  *
  * A bare `write.mode("append")` in foreachBatch is only at-least-once:
  * if the JVM dies after the files commit but before the checkpoint
  * offset advances, the batch re-delivers and appends again — and the
  * (doc, w)-unique grains the stores guarantee (TokenStore df-by-row-
  * count, RetrievalIndex postings) silently double. This ledger makes
  * the append idempotent by construction:
  *
  *   1. the batch stages to `_staging_<batchId>/` with overwrite (a
  *      replay overwrites its own leftovers — idempotent), coalesced to
  *      ONE part file (micro-batch grain, so the single deterministic
  *      target below is possible);
  *   2. that part file renames to `batch-<batchId>.parquet` in the
  *      destination dir — the ATOMIC commit point (local-FS rename; an
  *      object-store deployment uses its atomic put/copy instead);
  *   3. a replayed batchId sees the target file and no-ops.
  *
  * Crash anywhere before the rename → replay restages and renames;
  * crash after → replay no-ops. Readers see either no file or the whole
  * file, never a partial append. The destination stays a plain parquet
  * directory (the build's part-*.parquet and these batch-*.parquet read
  * together), so consumers need no layout change.
  */
object AppendLedger {

  /** Append `batch` into `destDir` exactly once for `batchId`. Returns
    * false when the batchId already committed (replay no-op).
    *
    * RETENTION CONTRACT: batch ids come from the stream's checkpoint.
    * Retain (or wipe) the checkpoint and the store TOGETHER — a fresh
    * checkpoint against an existing store restarts ids at 0 and the
    * ledger would treat genuinely new batches as replays (the no-op
    * path warns for this reason). */
  def appendOnce(destDir: String, batchId: Long,
                 batch: DataFrame): Boolean = {
    val target = new java.io.File(s"$destDir/batch-$batchId.parquet")
    val staging = s"$destDir/_staging_$batchId"
    if (target.exists()) {
      // a crash between the rename-commit and the staging cleanup leaves
      // the staged copy orphaned — clear it on the replay that follows
      graft.functions.FsUtil.deleteRecursively(new java.io.File(staging))
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"batch $batchId already committed to $destDir — skipping append " +
          "(replay no-op; if this stream was restarted with a FRESH " +
          "checkpoint against an existing store, its ids collide with " +
          "committed ones and this skip is dropping new data)")
      return false
    }
    batch.coalesce(1).write.mode("overwrite").parquet(staging)
    val part = Option(new java.io.File(staging).listFiles())
      .getOrElse(Array.empty)
      .find(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet"))
      .getOrElse(throw new java.io.IOException(
        s"no part file staged under $staging"))
    if (!part.renameTo(target))
      throw new java.io.IOException(s"could not commit $part to $target")
    graft.functions.FsUtil.deleteRecursively(new java.io.File(staging))
    true
  }
}

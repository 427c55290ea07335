package graft.streaming

import org.apache.spark.sql.DataFrame

/** EXACTLY-ONCE parquet append for foreachBatch maintenance sinks.
  *
  * A bare `write.mode("append")` in foreachBatch is only at-least-once:
  * if the JVM dies after the files commit but before the checkpoint
  * offset advances, the batch re-delivers and appends again — and the
  * (doc, w)-unique grains the stores guarantee (TokenStore df-by-row-
  * count, RetrievalIndex postings) silently double. This ledger makes
  * the append idempotent by construction: the batch commits through the
  * staged-rename primitive (functions/StagedCommit — shared with the
  * batch appendDocs paths) under the deterministic name
  * `batch-<batchId>.parquet`, so
  *
  *   - crash anywhere before the rename → replay restages and renames;
  *   - crash after → replay sees the target and no-ops.
  *
  * Readers see either no file or the whole file, never a partial append.
  * The destination stays a plain parquet directory (the build's
  * part-*.parquet, batch appends' append-*.parquet and these
  * batch-*.parquet read together), so consumers need no layout change.
  *
  * BATCH-ID ↔ STORE BINDING ([[bindEpoch]]): batch ids are only unique
  * within ONE checkpoint's lifetime. A stream restarted with a FRESH
  * checkpoint against an existing store restarts ids at 0, and every
  * genuinely new batch would look like a replay — silent data loss under
  * a routine operator error (wiping only the checkpoint dir). The epoch
  * guard makes that loud: the first commit stamps one random epoch id
  * into BOTH the checkpoint dir and each destination dir; any later
  * mismatch (either side wiped or swapped) throws at stream start,
  * forcing the operator to restore the checkpoint or rebuild the store.
  */
object AppendLedger {

  /** Append `batch` into `destDir` exactly once for `batchId`. Returns
    * false when the batchId already committed (replay no-op).
    *
    * RETENTION CONTRACT: batch ids come from the stream's checkpoint.
    * Retain (or wipe) the checkpoint and the store TOGETHER — the
    * [[bindEpoch]] stamp turns a violation into a loud failure at
    * stream start instead of silent skips here. */
  def appendOnce(destDir: String, batchId: Long,
                 batch: DataFrame): Boolean = {
    // a COMPACTED batch file leaves a tombstone instead of the marker
    // (CompactStore rewrote its survivors into ordinary part files) —
    // the id is still committed, so a replay must no-op here too
    val tombstoned = graft.functions.CompactStore.readTombstones(destDir)
      .contains(s"batch-$batchId.parquet")
    val committed = tombstoned || !graft.functions.StagedCommit.commitFile(
      destDir, s"batch-$batchId.parquet", batch)
    if (committed)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"batch $batchId already committed to $destDir — skipping append " +
          "(replay no-op; a FRESH checkpoint against an existing store " +
          "is caught by bindEpoch before any batch runs)")
    !committed
  }

  private def epochOf(f: java.io.File): Option[String] =
    if (f.isFile) Some(java.nio.file.Files.readString(f.toPath).trim)
    else None

  private def hasCommittedBatches(dest: String): Boolean =
    new java.io.File(s"$dest/_ledger_tombstones").isFile ||
      Option(new java.io.File(dest).listFiles()).getOrElse(Array.empty)
        .exists(f => f.getName.startsWith("batch-") &&
          f.getName.endsWith(".parquet"))

  /** Whether a Structured Streaming checkpoint dir has COMMITTED batch
    * history of its own (numeric entries under `commits/`, falling back
    * to `offsets/` for a checkpoint that died between offset-write and
    * commit). Distinguishes a legitimate pre-epoch checkpoint+store
    * pair (adoptable) from a genuinely fresh checkpoint against a
    * populated store (the data-loss scenario — refused). */
  private def hasHistory(checkpointDir: String): Boolean =
    Seq("commits", "offsets").exists { sub =>
      Option(new java.io.File(s"$checkpointDir/$sub").listFiles())
        .getOrElse(Array.empty)
        .exists(f => f.getName.nonEmpty && f.getName.forall(_.isDigit))
    }

  private def stamp(f: java.io.File, epoch: String): Unit = {
    Option(f.getParentFile).foreach(_.mkdirs())
    java.nio.file.Files.writeString(f.toPath, epoch): Unit
  }

  /** Bind a stream checkpoint to its ledger destination dirs — call
    * BEFORE starting the maintainer. First binding stamps a fresh epoch
    * id into the checkpoint dir and every destination; later bindings
    * require all stamps to agree:
    *
    *   - checkpoint epoch ≠ store epoch → throw (dirs from two different
    *     streams were mixed);
    *   - store stamped + committed batches, checkpoint unstamped → throw
    *     (the data-loss scenario: a fresh checkpoint would replay ids
    *     the store already holds, and every new batch would no-op);
    *   - checkpoint stamped, store unstamped → throw (the store was
    *     wiped or rebuilt behind the checkpoint — earlier committed
    *     batches are gone; wipe the checkpoint too and rebuild);
    *   - store stamped but NO committed batches, checkpoint unstamped →
    *     a crash mid-first-stamp (dests stamp before the checkpoint);
    *     adopt the store's epoch and finish stamping.
    */
  def bindEpoch(checkpointDir: String, destDirs: Seq[String]): Unit = {
    require(destDirs.nonEmpty, "bindEpoch needs at least one destination")
    val cpFile = new java.io.File(s"$checkpointDir/graft-ledger-epoch")
    val cpEpoch = epochOf(cpFile)
    val destEpochs = destDirs.map(d =>
      d -> epochOf(new java.io.File(s"$d/_ledger_epoch")))
    val distinct = destEpochs.flatMap(_._2).distinct
    if (distinct.size > 1)
      throw new IllegalStateException(
        s"destination dirs carry ${distinct.size} different ledger epochs " +
          s"($destEpochs) — they were maintained by different streams and " +
          "cannot bind to one checkpoint")
    destEpochs.foreach { case (dest, dEpoch) =>
      (cpEpoch, dEpoch) match {
        case (Some(c), Some(d)) if c != d =>
          throw new IllegalStateException(
            s"ledger epoch mismatch: checkpoint $checkpointDir has epoch " +
              s"$c but store $dest has $d — these dirs belong to " +
              "different stream lifetimes; restore the matching pair or " +
              "rebuild both")
        case (None, Some(_)) if hasCommittedBatches(dest) =>
          throw new IllegalStateException(
            s"fresh checkpoint $checkpointDir against store $dest that " +
              "already holds ledger-committed batches — restarting batch " +
              "ids at 0 would silently drop every new batch as a replay; " +
              "restore the original checkpoint or rebuild the store")
        case (Some(c), None) =>
          throw new IllegalStateException(
            s"checkpoint $checkpointDir (epoch $c) expects a stamped " +
              s"store at $dest but found none — the store was wiped or " +
              "rebuilt behind the checkpoint and its committed batches " +
              "are gone; wipe the checkpoint too and rebuild")
        case (None, None)
            if hasCommittedBatches(dest) && !hasHistory(checkpointDir) =>
          // an UNSTAMPED store with ledger history (maintained before
          // epochs existed, or its stamp was lost): binding a FRESH
          // checkpoint restarts ids at 0 against the committed ones —
          // the same silent-skip data loss the stamped case catches.
          // A checkpoint WITH its own committed-batch history is the
          // legitimate other reading (a pre-epoch deployment restarting
          // with its ORIGINAL matching checkpoint — round-12 ADVICE
          // finding #3): its next batch ids CONTINUE past the committed
          // ones, so the arm below adopts one epoch into both sides
          // instead of failing every legacy upgrade.
          throw new IllegalStateException(
            s"store $dest holds ledger-committed batches but no epoch " +
              "stamp, and the checkpoint has no committed history of its " +
              "own — new batch ids would collide with committed ones and " +
              "silently no-op; restore the original checkpoint+stamp " +
              "pair, or rebuild the store (to adopt a legacy store " +
              "deliberately, stamp both sides with one id by hand)")
        case (None, None)
            if hasCommittedBatches(dest) && hasHistory(checkpointDir) =>
          org.slf4j.LoggerFactory.getLogger(getClass).info(
            s"adopting legacy pre-epoch pair: checkpoint $checkpointDir " +
              s"has committed history and store $dest holds ledger " +
              "batches — stamping both with one fresh epoch")
        case _ => ()
      }
    }
    // first binding (or finishing a crashed one): one epoch for the set.
    // Stamp order: destinations FIRST, checkpoint LAST — a crash mid-way
    // leaves batch-less stamped dests, which the adoption arm above
    // resolves on the next bind; stamping the checkpoint first would
    // make the crash window indistinguishable from a wiped store.
    val epoch = cpEpoch
      .orElse(destEpochs.collectFirst { case (_, Some(e)) => e })
      .getOrElse(java.util.UUID.randomUUID().toString)
    destEpochs.foreach { case (dest, dEpoch) =>
      if (dEpoch.isEmpty) stamp(new java.io.File(s"$dest/_ledger_epoch"), epoch)
    }
    if (cpEpoch.isEmpty) stamp(cpFile, epoch)
  }
}

package graft.functions

import org.apache.spark.sql.DataFrame

/** Crash-atomic single-file parquet commits — the staged-rename primitive
  * shared by the STREAMING append ledger (streaming/AppendLedger, which
  * adds batch-id exactly-once semantics on top) and the BATCH
  * `appendDocs` paths of the persisted stores (TokenStore / GramStore /
  * RetrievalIndex — round-11 verdict task #2: those used bare
  * `mode("append")`, so a crash mid-append left partial batch rows in a
  * store whose `_SUCCESS` still vouched for it).
  *
  * The invariant both flavors buy: readers see either NO new file or the
  * WHOLE new file, never a partial append —
  *
  *   1. the delta stages to `_staging_<name>/` with overwrite (a retry
  *      overwrites its own leftovers), coalesced to ONE part file so the
  *      single deterministic rename target below is possible (deltas are
  *      batch-sized by contract — a full-corpus build takes the normal
  *      multi-file write path, not this primitive);
  *   2. that part file renames to `<name>` inside the destination dir —
  *      the ATOMIC commit point (local-FS rename; an object-store
  *      deployment uses its atomic put/copy instead);
  *   3. staging dirs are `_`-prefixed, so parquet readers never see a
  *      crashed attempt's leftovers — orphans are swept on the next
  *      append.
  */
object StagedCommit {

  /** Stage `df` as one parquet part file and rename it to
    * `destDir/<name>` — the atomic commit. Returns false (and clears the
    * staging leftovers) when the target already exists: the caller's
    * idempotency hook (AppendLedger's replay no-op). */
  private[graft] def commitFile(destDir: String, name: String,
                                df: DataFrame): Boolean = {
    val target = new java.io.File(s"$destDir/$name")
    val staging = s"$destDir/_staging_$name"
    if (target.exists()) {
      // a crash between the rename-commit and the staging cleanup leaves
      // the staged copy orphaned — clear it on the retry that follows
      FsUtil.deleteRecursively(new java.io.File(staging))
      return false
    }
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    val part = Option(new java.io.File(staging).listFiles())
      .getOrElse(Array.empty)
      .find(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet"))
      .getOrElse(throw new java.io.IOException(
        s"no part file staged under $staging"))
    if (!part.renameTo(target))
      throw new java.io.IOException(s"could not commit $part to $target")
    FsUtil.deleteRecursively(new java.io.File(staging))
    true
  }

  /** Crash-atomic batch append of `delta` into an EXISTING parquet
    * relation dir: requires the relation's `_SUCCESS` (appending into a
    * never-built store would mint a directory whose marker vouches for
    * delta-only rows as the whole corpus — the round-11 advice finding),
    * sweeps orphaned staging from earlier crashed appends, then commits
    * under a fresh unique name. A crash before the rename leaves only an
    * invisible `_staging_*` dir — the store reads exactly as before the
    * call. */
  def commitAppend(destDir: String, delta: DataFrame): Unit = {
    require(new java.io.File(s"$destDir/_SUCCESS").exists(),
      s"commitAppend target $destDir is not a built relation (no " +
        "_SUCCESS) — build the store first; appending into a missing " +
        "store would serve the delta alone as the whole corpus")
    sweepOrphans(destDir)
    commitFile(destDir,
      s"append-${java.util.UUID.randomUUID()}.parquet", delta): Unit
  }

  /** Delete staging leftovers of crashed batch appends (safe under the
    * stores' single-writer contract: no live append's staging dir can be
    * present when another append runs). */
  private def sweepOrphans(destDir: String): Unit =
    Option(new java.io.File(destDir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("_staging_append-"))
      .foreach(FsUtil.deleteRecursively)
}

package graft.functions

/** Tiny local-filesystem helpers shared by the artifact-maintenance
  * paths (DedupClusters' staged-swap retirement, IncrCcBench's
  * wipe-and-rebuild leg). Local `java.io.File` only — the write-once
  * artifacts live under the system tmpdir by design; a distributed
  * deployment retires artifact dirs through its object store's own
  * API instead. */
private[graft] object FsUtil {

  /** Recursive delete; silently no-ops on a missing path (idempotent —
    * callers use it to clear a possibly-absent staging/retired dir). */
  def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(): Unit
  }

  /** Single-writer guard for artifact maintenance, backed by an OS
    * advisory file lock (`FileChannel.tryLock` on `_writer.lock` under
    * the artifact root). The round-12 pid-file protocol detected dead
    * holders by reading `/proc/<pid>` and stole by delete+recreate —
    * which had a real exclusion hole (two stealers could both observe
    * the dead holder, both delete, and both acquire; round-12 ADVICE
    * finding #2) plus a theoretical pid-reuse misfire. The kernel lock
    * closes both for free:
    *
    *   - acquisition is atomic across processes (the OS arbitrates);
    *   - a crashed holder's lock releases AUTOMATICALLY with its
    *     process — no dead-pid detection, no steal path, no pid reuse;
    *   - a second acquirer in the SAME JVM surfaces as
    *     OverlappingFileLockException — refused identically.
    *
    * The lock FILE persists across acquisitions (deleting it would
    * reopen the classic unlink race: a late acquirer locks the removed
    * inode while a fresh one locks its replacement, and both "hold").
    * Its content is the holder's pid — diagnostics only, truncated on
    * release, never consulted for exclusion. A contended acquire fails
    * LOUD instead of corrupting the artifact. Not reentrant: hold it
    * only at the outermost mutator (recovery helpers called inside a
    * locked mutator stay unlocked; store mutators lock the store ROOT
    * while CompactStore locks the relation SUBDIR — disjoint paths, so
    * the nesting is safe). The streaming maintainers' foreachBatch
    * bodies reach this through the store mutators they call; a
    * Structured Streaming query is single-writer by construction, so
    * the lock only guards them against a concurrent BATCH mutator.
    * Advisory-lock semantics are local-FS / NFSv4; an object-store
    * deployment swaps in its conditional-put primitive. */
  def withWriterLock[T](artifactRoot: String)(body: => T): T = {
    val dir = new java.io.File(artifactRoot)
    dir.mkdirs(): Unit
    val lock = new java.io.File(dir, "_writer.lock")
    val ch = java.nio.channels.FileChannel.open(lock.toPath,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE)
    val held =
      try ch.tryLock()
      catch {
        case _: java.nio.channels.OverlappingFileLockException =>
          null // this JVM already holds it (another thread)
      }
    if (held == null) {
      val holder =
        try java.nio.file.Files.readString(lock.toPath).trim
        catch { case _: java.io.IOException => "" }
      ch.close()
      throw new IllegalStateException(
        s"another maintenance writer holds $lock" +
          (if (holder.nonEmpty) s" (pid $holder)" else "") +
          " — artifact mutation is single-writer; wait for it to finish" +
          " (a crashed holder's lock releases with its process)")
    }
    try {
      // stamp the holder pid for diagnostics (the refusal message above)
      ch.truncate(0): Unit
      ch.write(java.nio.ByteBuffer.wrap(
        s"${ProcessHandle.current().pid()}\n".getBytes("UTF-8"))): Unit
      ch.force(false)
      body
    } finally {
      // clear the stamp BEFORE releasing so no released lock file ever
      // names a pid (a stale stamp would implicate a live-but-unrelated
      // process in a later refusal message)
      try { ch.truncate(0): Unit } catch { case _: java.io.IOException => () }
      held.release()
      ch.close()
    }
  }

  /** [[withWriterLock]] with a bounded WAIT instead of an immediate
    * refusal — for heal-on-read paths where the competing holder is
    * another healer (or a live compaction writer) that will finish
    * momentarily. */
  def withWriterLockWait[T](artifactRoot: String,
                            maxWaitMs: Long = 60000)(body: => T): T = {
    val deadline = System.currentTimeMillis() + maxWaitMs
    var last: Option[IllegalStateException] = None
    while (System.currentTimeMillis() < deadline) {
      try return withWriterLock(artifactRoot)(body)
      catch {
        case e: IllegalStateException =>
          last = Some(e); Thread.sleep(100)
      }
    }
    throw last.getOrElse(new IllegalStateException(
      s"timed out waiting for the writer lock on $artifactRoot"))
  }
}

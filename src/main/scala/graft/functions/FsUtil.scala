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

  /** BEST-EFFORT single-writer guard for artifact maintenance (round-11
    * verdict task #7: the single-writer contract was documentation-only,
    * so a mis-wired second maintainer could interleave staged swaps).
    * `_writer.lock` under the artifact root is created atomically
    * (File.createNewFile) and holds the owner's pid: a second writer
    * fails LOUD instead of corrupting the artifact, and a lock whose
    * owner pid is dead (crashed JVM — checked via /proc, this
    * deployment's platform) is stolen with a warning rather than
    * bricking the artifact until manual cleanup. Not reentrant: hold it
    * only at the outermost mutator (recovery helpers called inside a
    * locked mutator stay unlocked). The streaming maintainers skip it —
    * a Structured Streaming query is single-writer by construction. */
  def withWriterLock[T](artifactRoot: String)(body: => T): T = {
    val dir = new java.io.File(artifactRoot)
    dir.mkdirs(): Unit
    val lock = new java.io.File(dir, "_writer.lock")
    val myPid = s"${ProcessHandle.current().pid()}"
    if (lock.isFile) {
      val holder =
        try java.nio.file.Files.readString(lock.toPath).trim
          .takeWhile(_.isDigit)
        catch { case _: java.io.IOException => "" }
      if (holder.nonEmpty && !new java.io.File(s"/proc/$holder").exists()) {
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"stealing writer lock on $artifactRoot from dead pid $holder")
        lock.delete(): Unit
      }
    }
    // ACQUIRE = hard-link a pre-written pid file onto the lock path:
    // link creation is atomic and fails if the target exists, so the
    // lock can never exist without its holder's pid (no crashed-acquire
    // debris), and two racing stealers resolve to exactly one winner.
    val tmp = new java.io.File(dir,
      s"_writer.lock.tmp.$myPid.${System.nanoTime()}")
    java.nio.file.Files.writeString(tmp.toPath, s"$myPid\n"): Unit
    try java.nio.file.Files.createLink(lock.toPath, tmp.toPath): Unit
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        tmp.delete(): Unit
        throw new IllegalStateException(
          s"another maintenance writer holds $lock — artifact mutation " +
            "is single-writer; wait for it (or remove the lock if its " +
            "owner pid is gone)")
    }
    tmp.delete(): Unit
    try body
    finally lock.delete(): Unit
  }

  /** [[withWriterLock]] with a bounded WAIT instead of an immediate
    * refusal — for heal-on-read paths where the competing holder is
    * another healer that will finish momentarily. */
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

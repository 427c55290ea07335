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
    if (!lock.createNewFile())
      throw new IllegalStateException(
        s"another maintenance writer holds $lock — artifact mutation is " +
          "single-writer; wait for it (or remove the lock if its owner " +
          "pid is gone)")
    try {
      java.nio.file.Files.writeString(lock.toPath,
        s"${ProcessHandle.current().pid()}\n"): Unit
      body
    } finally lock.delete(): Unit
  }
}

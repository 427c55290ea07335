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
}

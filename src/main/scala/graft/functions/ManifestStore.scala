package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths, StandardCopyOption, StandardOpenOption}

/** MANIFEST-COMMITTED parquet store — the scale successor to the
  * directory-listing stores (round-12 verdict tasks #3 and #5, which
  * converge on this one structure):
  *
  *   - task #3: `StagedCommit.commitFile` coalesces every append delta
  *     to ONE part file because a single atomic rename needs a single
  *     target — right for batch-sized deltas, but a 100 TB deployment
  *     appending ~1% corpus increments would serialize the whole
  *     increment through one task. Here an append stages N part files
  *     in parallel and commits them ALL with one pointer swap.
  *   - task #5: CompactStore's apply window excludes concurrent readers
  *     (an old touched file can momentarily coexist with its
  *     replacement). Here readers PIN a snapshot's complete file list,
  *     a compaction publishes a new manifest without deleting the old
  *     files, and the pinned reader keeps its consistent view — the
  *     Iceberg/Delta shape reduced to its load-bearing core.
  *
  * Layout under the store root:
  *
  *   data/<uuid>-part-*.parquet   the immutable data files. Readers
  *                                NEVER list this directory, so an
  *                                uncommitted (crashed) stage is
  *                                invisible without `_`-prefix tricks.
  *   _manifests/<name>            one text file per snapshot: the
  *                                COMPLETE data-relative file list,
  *                                one per line. Immutable once written.
  *   _current                     one line: the live manifest's name.
  *                                The ATOMIC rename of a staged twin
  *                                onto this path is every mutation's
  *                                single commit point.
  *
  * Reader-resolution contract: [[read]] resolves `_current` → manifest
  * → `spark.read.parquet(files…)`. The file list is pinned at resolve
  * time, so a plan (or a long job over it) observes one snapshot no
  * matter how many commits land meanwhile; only [[vacuum]] — an
  * explicitly operator-scheduled maintenance action with a grace
  * period — ever deletes a data file, so a pinned reader outlives any
  * number of commits, and outlives vacuum for reads shorter than the
  * grace. Mutations serialize on the store's writer lock; a crash
  * ANYWHERE before the `_current` rename leaves the previous snapshot
  * live and at worst orphans data files that the next [[vacuum]]
  * sweeps (they are unreferenced by every manifest).
  *
  * Exactly-once appends reuse the AppendLedger idea keyed off the
  * MANIFEST name instead of a data-file name: [[appendOnce]] commits
  * manifest `m<seq>-b<batchId>`, so a replayed batch id is detected by
  * scanning manifest names — no separate ledger file, and compactions
  * never disturb it because manifests are immutable (the tombstone
  * machinery the directory stores need does not exist here AT ALL).
  *
  * The directory stores stay the right tool for batch-sized deltas
  * (one file, zero indirection, plain `spark.read.parquet(dir)`
  * consumers); this layer is for multi-task increments and
  * multi-tenant readers. An object-store deployment maps the rename to
  * its atomic put-if-match / copy primitive.
  */
object ManifestStore {

  /** The live manifest name, or None for a store with no committed
    * snapshot yet. */
  private def currentName(root: String): Option[String] = {
    val f = new java.io.File(s"$root/_current")
    if (f.isFile) Some(Files.readString(f.toPath).trim).filter(_.nonEmpty)
    else None
  }

  private def manifestFiles(root: String, name: String): Seq[String] =
    Files.readAllLines(Paths.get(s"$root/_manifests/$name"))
      .toArray(Array.empty[String]).toSeq.filter(_.nonEmpty)

  /** The pinned file list of the current snapshot (absolute paths) —
    * exposed so tests and long-running consumers can hold a snapshot
    * explicitly. Empty store → empty list. */
  def snapshot(root: String): Seq[String] =
    currentName(root).toSeq
      .flatMap(manifestFiles(root, _))
      .map(rel => s"$root/data/$rel")

  /** Read the current snapshot. The file list is resolved NOW and the
    * returned frame keeps reading exactly those files — commits that
    * land after this call do not change what it sees. */
  def read(spark: SparkSession, root: String): DataFrame = {
    val files = snapshot(root)
    require(files.nonEmpty, s"$root has no committed snapshot")
    spark.read.parquet(files: _*)
  }

  /** Stage `df` as multi-file parquet and move its part files into
    * `data/` under a fresh uuid prefix; returns the data-relative
    * names. NOT yet visible to any reader — visibility is the caller's
    * manifest commit. */
  private def stageFiles(root: String, df: DataFrame): Seq[String] = {
    val uuid = java.util.UUID.randomUUID().toString
    val staging = new java.io.File(s"$root/_staging_$uuid")
    df.write.mode("overwrite").parquet(staging.getPath)
    val parts = Option(staging.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet"))
      .toSeq
    require(parts.nonEmpty, s"no part files staged under $staging")
    new java.io.File(s"$root/data").mkdirs(): Unit
    val named = parts.map { f =>
      val name = s"$uuid-${f.getName}"
      if (!f.renameTo(new java.io.File(s"$root/data/$name")))
        throw new java.io.IOException(s"could not move $f into data/")
      name
    }
    FsUtil.deleteRecursively(staging)
    named
  }

  /** Write manifest `name` listing `files`, then atomically swap
    * `_current` to it — THE commit point of every mutation. */
  private def commitManifest(root: String, name: String,
                             files: Seq[String]): Unit = {
    new java.io.File(s"$root/_manifests").mkdirs(): Unit
    val mf = Paths.get(s"$root/_manifests/$name")
    Files.writeString(mf, files.mkString("", "\n", "\n"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING): Unit
    val tmp = Paths.get(s"$root/_current.tmp.${System.nanoTime()}")
    Files.writeString(tmp, name): Unit
    Files.move(tmp, Paths.get(s"$root/_current"),
      StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE): Unit
  }

  /** Next manifest sequence number (manifest names sort by a
    * zero-padded sequence so the latest is also lexically last). */
  private def nextSeq(root: String): Long =
    currentName(root).map(_.drop(1).takeWhile(_.isDigit).toLong + 1)
      .getOrElse(0L)

  private def seqName(seq: Long, suffix: String): String =
    f"m$seq%012d$suffix"

  /** Create the store from `df` (multi-file write). Refuses an already
    * initialized store. */
  def create(root: String, df: DataFrame): Unit =
    FsUtil.withWriterLock(root) {
      require(currentName(root).isEmpty, s"$root already initialized")
      commitManifest(root, seqName(0L, ""), stageFiles(root, df))
    }

  /** Multi-file atomic append: stage `delta` in parallel (N part
    * files), commit manifest = current list + new files in ONE pointer
    * swap. Readers see the whole delta or none of it. */
  def append(root: String, delta: DataFrame): Unit =
    FsUtil.withWriterLock(root) {
      val cur = currentName(root).getOrElse(throw new IllegalStateException(
        s"append target $root has no committed snapshot — create() first; " +
          "appending into a missing store would serve the delta alone " +
          "as the whole corpus"))
      val staged = stageFiles(root, delta)
      commitManifest(root, seqName(nextSeq(root), ""),
        manifestFiles(root, cur) ++ staged)
    }

  /** [[append]] exactly once per `batchId` (streaming foreachBatch):
    * the committed manifest is named `m<seq>-b<batchId>`, so a replay
    * finds the marker by name and no-ops — returns false. Manifests
    * are immutable, so no compaction can erase the marker (the
    * directory stores needed ledger tombstones for exactly this). */
  def appendOnce(root: String, batchId: Long, delta: DataFrame): Boolean =
    FsUtil.withWriterLock(root) {
      val marker = s"-b$batchId"
      val seen = Option(new java.io.File(s"$root/_manifests").listFiles())
        .getOrElse(Array.empty).exists(_.getName.endsWith(marker))
      if (seen) false
      else {
        val cur = currentName(root).getOrElse(
          throw new IllegalStateException(
            s"appendOnce target $root has no committed snapshot"))
        val staged = stageFiles(root, delta)
        commitManifest(root, seqName(nextSeq(root), marker),
          manifestFiles(root, cur) ++ staged)
        true
      }
    }

  /** Snapshot-isolated DELETE/UPDATE compaction: the CompactStore
    * touched-files discipline, but the apply is a pointer swap — old
    * files are NOT deleted (vacuum's job), so readers pinned on the
    * previous snapshot keep a consistent view through and after the
    * commit. */
  def compact(root: String, idCol: String, removeIds: DataFrame,
              replacement: Option[DataFrame] = None): Unit =
    FsUtil.withWriterLock(root) {
      val spark = removeIds.sparkSession
      val cur = currentName(root).getOrElse(throw new IllegalStateException(
        s"compact target $root has no committed snapshot"))
      val files = manifestFiles(root, cur)
      val abs = files.map(f => s"$root/data/$f")
      val rel = spark.read.parquet(abs: _*)
      val relCols = rel.columns.toIndexedSeq
      val rm = removeIds.select(org.apache.spark.sql.functions.col(idCol))
        .distinct()
      import org.apache.spark.sql.functions.{broadcast, col, input_file_name}
      val touchedAbs = rel.withColumn("_f", input_file_name())
        .join(broadcast(rm), Seq(idCol), "semi")
        .select("_f").distinct().collect()
        .map(r => new java.io.File(
          new java.net.URI(r.getString(0))).getCanonicalPath)
      val dataBase = new java.io.File(s"$root/data").getCanonicalPath
      val touched = touchedAbs.map { p =>
        require(p.startsWith(dataBase + java.io.File.separator),
          s"touched file $p outside $dataBase")
        p.substring(dataBase.length + 1)
      }.toSet
      val survivors =
        if (touched.isEmpty) None
        else Some(spark.read
          .parquet(touched.toSeq.map(f => s"$root/data/$f"): _*)
          .join(broadcast(rm), Seq(idCol), "left_anti"))
      val stagedDf = (survivors, replacement) match {
        case (Some(a), Some(b)) => Some(a.unionByName(
          b.select(a.columns.map(col).toIndexedSeq: _*)))
        case other => other._1.orElse(other._2)
      }
      stagedDf match {
        case None => () // nothing touched, nothing to add
        case Some(df) =>
          val staged = stageFiles(root, df.select(relCols.map(col): _*))
          commitManifest(root, seqName(nextSeq(root), ""),
            files.filterNot(touched) ++ staged)
      }
    }

  /** Delete data files unreferenced by the CURRENT manifest and
    * manifests other than the current one, both only when older than
    * `graceMs` — the grace bounds how long a pinned reader stays safe
    * after its snapshot is superseded (schedule vacuum with a grace
    * above the longest read job). Returns the number of files
    * removed. */
  def vacuum(root: String, graceMs: Long): Int =
    FsUtil.withWriterLock(root) {
      currentName(root).fold(0) { cur =>
        val live = manifestFiles(root, cur).toSet
        val cutoff = System.currentTimeMillis() - graceMs
        val deadData = Option(new java.io.File(s"$root/data").listFiles())
          .getOrElse(Array.empty)
          .filter(f => !live.contains(f.getName) &&
            f.lastModified() < cutoff)
        val deadManifests =
          Option(new java.io.File(s"$root/_manifests").listFiles())
            .getOrElse(Array.empty)
            .filter(f => f.getName != cur && f.lastModified() < cutoff)
        // leftover staging dirs from crashed mutations age out the same
        // way
        val deadStaging = Option(new java.io.File(root).listFiles())
          .getOrElse(Array.empty)
          .filter(f => f.isDirectory &&
            f.getName.startsWith("_staging_") && f.lastModified() < cutoff)
        (deadData ++ deadManifests).foreach(f => f.delete(): Unit)
        deadStaging.foreach(FsUtil.deleteRecursively)
        deadData.length + deadManifests.length
      }
    }
}

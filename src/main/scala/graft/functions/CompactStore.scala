package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DELETE/UPDATE compaction for the per-doc-grain persisted stores —
  * the append-only contract's documented gap (round-11 verdict task #1):
  * every store scaladoc deferred updates to "rebuild or delete+append
  * compaction", but none existed, so a single takedown forced a
  * full rebuild of six artifact families. A living 100 TB corpus takes
  * deletions (takedowns, licensing, contamination discoveries) as
  * surely as appends.
  *
  * The rewrite is TOUCHED-FILES-ONLY — the property that makes it a
  * compaction rather than a rebuild: because every stored row is
  * per-doc, deleting doc ids rewrites only the files that physically
  * hold their rows (located with `input_file_name()` + a broadcast
  * semi-join against the removal set), unions the survivors with the
  * caller-built replacement rows, and leaves every untouched file —
  * the overwhelming bulk at warehouse scale — byte-identical on disk.
  *
  * Crash discipline (the DedupClusters staged-swap family):
  *
  *   1. survivors + replacements stage under `_compact/data/`
  *      (`_`-prefixed — invisible to parquet readers);
  *   2. the COMMIT POINT is writing `_compact/commit`, which lists the
  *      old files to delete — before it exists, [[heal]] aborts the
  *      attempt and the store reads exactly as before;
  *   3. apply = move staged files in (globally-unique part names, so a
  *      replay skips files already moved), delete the listed old files
  *      (idempotent), drop `_compact/`.
  *
  * A crash anywhere replays through [[heal]], which every caller runs
  * first. SINGLE-WRITER, NO CONCURRENT READERS during the apply window
  * (a reader could momentarily see an old touched file alongside its
  * replacement) — the same maintenance contract the cluster artifact
  * documents; steady-state reads between compactions are unrestricted.
  */
object CompactStore {

  /** Compact one parquet relation dir in place: drop every row whose
    * `idCol` is in `removeIds` (one column, distinct ids) and add
    * `replacement` rows (the caller's rebuilt rows for updated docs —
    * ids being re-added must also appear in `removeIds`, the
    * delete+append update idiom). No-ops when nothing is touched and no
    * replacement rows exist.
    *
    * SIZING CONTRACT: removal sets are TAKEDOWN-sized — the broadcast
    * semi-join ships them to every scan task, and the rewrite volume is
    * (touched files × their full rows). A mass deletion whose ids hit
    * most files approaches a full rewrite with broadcast pressure on
    * top; past ~10% of the corpus, rebuild the store instead. */
  def compactRelation(relDir: String, idCol: String, removeIds: DataFrame,
                      replacement: Option[DataFrame]): Unit = {
    val spark = removeIds.sparkSession
    heal(relDir)
    require(new java.io.File(s"$relDir/_SUCCESS").exists(),
      s"compactRelation target $relDir is not a built relation")
    val rm = removeIds.select(col(idCol)).distinct()
    val rel = spark.read.parquet(relDir)
    // the relation's column ORDER is part of its on-disk contract: the
    // equi-join below would move idCol first, and a staged file with
    // reordered columns breaks positional consumers (and exceptAll
    // comparisons) on the next read — restore it before staging
    val relCols = rel.columns.toIndexedSeq
    val touched = touchedFiles(rel, idCol, rm)
    val hasRepl = replacement.isDefined
    if (touched.isEmpty && !hasRepl) return
    val survivors =
      if (touched.isEmpty) None
      else Some(spark.read.parquet(touched.toIndexedSeq: _*)
        .join(broadcast(rm), Seq(idCol), "left_anti"))
    val staged = (survivors, replacement) match {
      case (Some(a), Some(b)) => a.unionByName(b.select(a.columns.map(col)
        .toIndexedSeq: _*))
      case (Some(a), None) => a
      case (None, Some(b)) => b
      case (None, None) => return
    }
    val compactDir = s"$relDir/_compact"
    staged.select(relCols.map(col): _*)
      .write.mode("overwrite").parquet(s"$compactDir/data")
    require(new java.io.File(s"$compactDir/data/_SUCCESS").exists(),
      s"staging under $compactDir did not complete")
    // THE commit point: the marker lists the superseded files by local
    // name; everything after it is replayable
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$compactDir/commit"),
      touched.map(relativeName(relDir, _)).mkString("\n")): Unit
    // apply through heal(): the marker exists now, and heal serializes
    // on the relation lock — a reader-healer racing this writer's own
    // apply would otherwise fight over the renames
    heal(relDir)
  }

  /** Partition-aware flavor for cell-PARTITIONED relations (IvfIndex
    * `cells/`, ProductQuantizer `codes/`): the same touched-files
    * discipline, but survivors are read with the partition column
    * attached (`basePath`) and staged back PARTITIONED, so every
    * replacement file lands inside its original cell dir. Deletions
    * only (per-id rows; an updated vector composes remove + append). */
  def compactPartitioned(relDir: String, idCol: String, partCol: String,
                         removeIds: DataFrame): Unit = {
    val spark = removeIds.sparkSession
    heal(relDir)
    require(new java.io.File(s"$relDir/_SUCCESS").exists(),
      s"compactPartitioned target $relDir is not a built relation")
    val rm = removeIds.select(col(idCol)).distinct()
    val rel = spark.read.parquet(relDir)
    val relCols = rel.columns.toIndexedSeq
    val touched = touchedFiles(rel, idCol, rm)
    if (touched.isEmpty) return
    val survivors = spark.read.option("basePath", relDir)
      .parquet(touched.toIndexedSeq: _*)
      .join(broadcast(rm), Seq(idCol), "left_anti")
    val compactDir = s"$relDir/_compact"
    survivors.select(relCols.map(col): _*)
      .write.mode("overwrite").partitionBy(partCol)
      .parquet(s"$compactDir/data")
    require(new java.io.File(s"$compactDir/data/_SUCCESS").exists(),
      s"staging under $compactDir did not complete")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$compactDir/commit"),
      touched.map(relativeName(relDir, _)).mkString("\n")): Unit
    // apply through heal(): the marker exists now, and heal serializes
    // on the relation lock — a reader-healer racing this writer's own
    // apply would otherwise fight over the renames
    heal(relDir)
  }

  /** Past this many removal ids the touched-file probe switches from an
    * `isin` literal filter (pushed to parquet row-group statistics — a
    * takedown batch's locate step then SKIPS the row groups, and in the
    * common sorted-by-id layout whole files, that cannot hold its ids)
    * to a broadcast semi-join (no pushdown, full id-column sweep). */
  private val IsinPushdownLimit = 10000

  /** The files physically holding any `rm` id. Small removal sets ride
    * the pushed-down literal filter; larger ones the semi-join (the
    * sizing contract caps them anyway). */
  private def touchedFiles(rel: DataFrame, idCol: String,
                           rm: DataFrame): Array[String] = {
    val sample = rm.limit(IsinPushdownLimit + 1).collect()
    val keyed = rel.withColumn("_f", input_file_name())
    val hit =
      if (sample.length <= IsinPushdownLimit)
        keyed.filter(col(idCol).isin(sample.toIndexedSeq.map(_.get(0)): _*))
      else keyed.join(broadcast(rm), Seq(idCol), "semi")
    hit.select("_f").distinct().collect().map(_.getString(0))
  }

  /** Finish (post-commit) or abort (pre-commit) an interrupted
    * compaction — pure file operations, idempotent, run by every caller
    * before reading or rewriting. The common path (no debris) is one
    * existence check; when debris IS present, healers serialize on the
    * relation's own writer lock — heal runs on READ paths too, and two
    * readers racing the same apply would fight over the renames. */
  def heal(relDir: String): Unit = {
    if (!new java.io.File(s"$relDir/_compact").exists()) return
    FsUtil.withWriterLockWait(relDir) {
      val compactDir = new java.io.File(s"$relDir/_compact")
      if (compactDir.exists()) {
        if (new java.io.File(compactDir, "commit").isFile)
          applyCommit(relDir)
        else // crashed before the commit
          FsUtil.deleteRecursively(compactDir)
      }
    }
  }

  private def applyCommit(relDir: String): Unit = {
    val compactDir = new java.io.File(s"$relDir/_compact")
    val data = new java.io.File(compactDir, "data")
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else Seq(f)
    // move staged part files in FIRST (readers lose no rows mid-apply);
    // part names carry a job-unique uuid, so a replayed move whose
    // target exists means a partially-applied crash already moved it.
    // The walk is recursive so a PARTITIONED staging (cell=X/part-*)
    // lands back inside its partition dir.
    val dataBase = data.getCanonicalPath
    walk(data)
      .filter(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet"))
      .foreach { f =>
        val rel = f.getCanonicalPath.substring(dataBase.length + 1)
        val target = new java.io.File(relDir, rel)
        Option(target.getParentFile).foreach(_.mkdirs())
        if (!target.exists() && !f.renameTo(target))
          throw new java.io.IOException(s"could not move $f to $target")
      }
    val retired = java.nio.file.Files
      .readString(new java.io.File(compactDir, "commit").toPath)
      .split("\n").filter(_.nonEmpty)
    // TOMBSTONE retired ledger batch files BEFORE deleting them: a
    // compaction that rewrites `batch-<id>.parquet` (its survivors move
    // into ordinary part files) would otherwise erase the append
    // ledger's replay marker — a crashed append stream replaying that
    // batch id would re-commit the whole batch, doubling surviving rows
    // and resurrecting removed docs. AppendLedger.appendOnce treats a
    // tombstoned id as committed. Written before the deletes (a crash
    // in between replays the delete; a duplicate tombstone line is
    // harmless — readers use set semantics).
    val tombs = retired.filter(n =>
      n.startsWith("batch-") && n.endsWith(".parquet"))
    if (tombs.nonEmpty)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$relDir/_ledger_tombstones"),
        tombs.mkString("", "\n", "\n"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND): Unit
    // then retire the superseded files (idempotent deletes; names may
    // carry partition subpaths)
    retired.foreach(n => new java.io.File(relDir, n).delete(): Unit)
    FsUtil.deleteRecursively(compactDir)
  }

  /** Path of an `input_file_name()` URI relative to the relation dir —
    * the file name for a flat relation, `cell=X/part-...` for a
    * partitioned one. */
  private def relativeName(relDir: String, uri: String): String = {
    val base = new java.io.File(relDir).getCanonicalPath
    val p = new java.io.File(new java.net.URI(uri)).getCanonicalPath
    require(p.startsWith(base + java.io.File.separator),
      s"file $uri is not under relation dir $relDir")
    p.substring(base.length + 1)
  }
}

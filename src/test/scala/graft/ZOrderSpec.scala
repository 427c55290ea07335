package graft

import graft.sources.ZOrderWrite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Z-order layout writer (sources/ZOrderWrite.scala): per-file min/max
  * tightness on ALL clustered columns — the property parquet row-group
  * skipping feeds on. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** 64×64 uniform grid, 4 rows per cell — two independent dimensions. */
  private lazy val grid: DataFrame =
    spark.range(0, 64L * 64 * 4).select(
      (col("id") % 64).cast("int").as("x"),
      ((col("id") / 64) % 64).cast("int").as("y"),
      col("id").as("payload"))

  /** Average per-file (max−min)/range width of `c` after writing `df`. */
  private def avgFileWidth(df: DataFrame, write: DataFrame => DataFrame,
                           c: String): Double = {
    val dir = Files.createTempDirectory("graft-zorder").toFile
    dir.deleteOnExit()
    write(df).write.mode("overwrite").parquet(dir.getAbsolutePath)
    val back = spark.read.parquet(dir.getAbsolutePath)
    val widths = back
      .groupBy(input_file_name().as("f"))
      .agg(((max(col(c)) - min(col(c))) / 63.0).as("w"))
      .select(avg("w")).head().getDouble(0)
    widths
  }

  test("z-order keeps BOTH dimensions tight; single-column sort only one") {
    val files = 16
    val zx = avgFileWidth(grid, d => ZOrderWrite.zorderBy(d, Seq("x", "y"), files, bits = 6), "x")
    val zy = avgFileWidth(grid, d => ZOrderWrite.zorderBy(d, Seq("x", "y"), files, bits = 6), "y")
    // naive layout: range-sorted by x only
    val nx = avgFileWidth(grid, d => d.repartitionByRange(files, col("x")), "x")
    val ny = avgFileWidth(grid, d => d.repartitionByRange(files, col("x")), "y")

    // 16 files over a 64×64 grid → ideal z-tiles are 16×16 cells: ~25%
    // width per dimension. RangePartitioner SAMPLES its boundaries, so a
    // file can straddle an aligned tile edge and widen one dimension to
    // ~2 tiles on a given run — bound each dimension at half-width and
    // their mean tighter, vs the sort baseline's full-width y.
    assert(zx < 0.55, s"z-order x width $zx not tight")
    assert(zy < 0.55, s"z-order y width $zy not tight")
    assert((zx + zy) / 2 < 0.45, s"z-order mean width ${(zx + zy) / 2} not tight")
    assert(nx < 0.20, s"x-sorted baseline should be tight on x, got $nx")
    assert(ny > 0.90, s"x-sorted baseline should be full-width on y, got $ny")
  }

  /** Sum of parquet-scan output rows for `pred` over `path` — rows that
    * SURVIVED row-group skipping (the reader prunes row groups whose
    * footer min/max excludes the pushed filter; survivors stream out of
    * the scan before Spark's own Filter re-checks per row). The
    * query-time number the layout exists to shrink. */
  private def scannedRows(path: String, pred: org.apache.spark.sql.Column): Long = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val df = spark.read.parquet(path).filter(pred)
    df.collect()
    def leaves(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => leaves(a.executedPlan)
      case s: QueryStageExec => leaves(s.plan)
      case o if o.children.isEmpty => Seq(o)
      case o => o.children.flatMap(leaves)
    }
    leaves(df.queryExecution.executedPlan)
      .collect { case f: FileSourceScanExec => f.metrics("numOutputRows").value }
      .sum
  }

  test("z-order prunes row groups AT QUERY TIME on both dims; single-sort on one") {
    val files = 16
    val total = 64L * 64 * 4
    val zDir = Files.createTempDirectory("graft-zq").toFile
    val sDir = Files.createTempDirectory("graft-sq").toFile
    zDir.deleteOnExit(); sDir.deleteOnExit()
    ZOrderWrite.zorderBy(grid, Seq("x", "y"), files, bits = 6)
      .write.mode("overwrite").parquet(zDir.getAbsolutePath)
    grid.repartitionByRange(files, col("x"))
      .write.mode("overwrite").parquet(sDir.getAbsolutePath)

    val zx = scannedRows(zDir.getAbsolutePath, col("x") === 30)
    val zy = scannedRows(zDir.getAbsolutePath, col("y") === 30)
    val sx = scannedRows(sDir.getAbsolutePath, col("x") === 30)
    val sy = scannedRows(sDir.getAbsolutePath, col("y") === 30)
    info(s"scan rows after row-group skipping (of $total): " +
      s"zorder x=$zx y=$zy | x-sorted x=$sx y=$sy")

    // 16 z-tiles over a 64x64 grid: a point predicate on EITHER dim can
    // touch only the one tile row/column containing it (~4 of 16 files);
    // sampled boundaries may widen that by a file or two — bound at half
    assert(zx * 2 <= total, s"z-order did not skip on x: $zx of $total")
    assert(zy * 2 <= total, s"z-order did not skip on y: $zy of $total")
    // the x-sorted layout skips hard on x...
    assert(sx * 4 <= total, s"x-sorted layout should skip on x: $sx of $total")
    // ...and cannot skip AT ALL on y (full-width row groups)
    assert(sy >= (total * 9) / 10, s"x-sorted layout unexpectedly skipped on y: $sy")
    // the headline: z-order reads a fraction of the sorted layout's rows
    // for the second-dimension predicate
    assert(zy * 2 <= sy, s"z-order y-scan $zy not better than sorted $sy")
  }

  test("layout preserves the exact row multiset") {
    val out = ZOrderWrite.zorderBy(grid, Seq("x", "y"), 8, bits = 6)
    assert(out.columns.toSeq == grid.columns.toSeq, "helper column leaked")
    val a = out.groupBy("x", "y").count().orderBy("x", "y").collect().toSeq
    val b = grid.groupBy("x", "y").count().orderBy("x", "y").collect().toSeq
    assert(a == b)
  }

  test("string columns cluster too") {
    val docs = table("documents").select("doc_id", "lang", "source")
    val dir = Files.createTempDirectory("graft-zorder-str").toFile
    dir.deleteOnExit()
    ZOrderWrite.zorderBy(docs, Seq("lang", "source"), 4, bits = 4)
      .write.mode("overwrite").parquet(dir.getAbsolutePath)
    val back = spark.read.parquet(dir.getAbsolutePath)
    assert(back.count() == docs.count())
    // each file should see a subset of langs, not all of them
    val perFile = back.groupBy(input_file_name())
      .agg(countDistinct("lang").as("nl")).select(avg("nl")).head().getDouble(0)
    val total = docs.select(countDistinct("lang")).head().getLong(0).toDouble
    assert(perFile < total, s"files average $perFile of $total langs — no clustering")
  }

  test("zorderSized derives the file count from plan stats") {
    // tiny data + huge target → one output partition; tiny target → many
    val one = ZOrderWrite.zorderSized(grid, Seq("x", "y"), targetBytes = 1L << 40)
    assert(one.rdd.getNumPartitions == 1)
    val many = ZOrderWrite.zorderSized(grid, Seq("x", "y"), targetBytes = 4096)
    assert(many.rdd.getNumPartitions > 1)
    assert(many.count() == grid.count())
  }

  test("nulls and degenerate inputs don't break the layout") {
    val withNulls = grid.withColumn("x",
      when(col("payload") % 10 === 0, lit(null)).otherwise(col("x")))
    val out = ZOrderWrite.zorderBy(withNulls, Seq("x", "y"), 4, bits = 4)
    assert(out.count() == grid.count())

    // empty input passes through
    val empty = ZOrderWrite.zorderBy(grid.filter(lit(false)), Seq("x", "y"), 4)
    assert(empty.count() == 0)

    // contract violations fail fast
    intercept[IllegalArgumentException] {
      ZOrderWrite.zorderBy(grid, Seq("x"), 4, bits = 64)
    }
    // single column passes the 63-bit Morton check but exceeds the
    // sample-resolution cap (and 1 << bits would wrap an Int at 31+)
    intercept[IllegalArgumentException] {
      ZOrderWrite.zorderBy(grid, Seq("x"), 4, bits = 25)
    }
    intercept[IllegalArgumentException] {
      ZOrderWrite.zorderBy(
        grid.withColumn("b", col("payload").cast("string").cast("binary")),
        Seq("b"), 4)
    }
  }
}

package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-order (Morton-curve) data layout for multi-column file skipping.
  *
  * Why: parquet readers skip row groups whose footer min/max excludes the
  * filter predicate. Sorting the write by ONE column makes that column's
  * per-file ranges tight and every other column's ranges full-width — so
  * at 100 TB only one access pattern skips. Interleaving the bits of
  * several columns' rank codes (the Z-order curve — public technique, used
  * by every lakehouse OPTIMIZE implementation) keeps per-file min/max
  * tight on ALL participating columns simultaneously: a filter on any of
  * them prunes most files' row groups at scan time.
  *
  * Mechanics (one bounded driver step + one shuffle):
  *   1. sample ≤ sampleN rows in seeded-hash order (TakeOrdered — bounded
  *      per-partition heaps, no full sort; the IvfIndex.train precedent);
  *   2. per column, take 2^bits − 1 sample quantile boundaries — RANK
  *      coding, so skewed distributions still fill all buckets;
  *   3. per row, binary-search each column's bucket id and interleave the
  *      id bits into one Morton key (a long — k·bits ≤ 63 enforced);
  *   4. `repartitionByRange` on the key (range exchange samples the key,
  *      so output files are balanced) + `sortWithinPartitions`, then drop
  *      the helper column. Call `.write` on the result.
  *
  * Numeric/date/timestamp columns rank via a double cast; string columns
  * rank on raw string order. The per-row bucket lookup is a JVM udf —
  * justified the same way as the Bloom probe (PipelineQueries): no
  * built-in does broadcast-boundary binary search, the work is one
  * O(bits) lookup per row on the one-time layout job, never on a query
  * path. */
object ZOrderWrite {

  /** Boundary array for one column's rank coding: `lo` of the bucket i is
    * bounds(i-1); value v lands in the first bucket whose upper boundary
    * exceeds it. */
  private def boundariesOf[T](sorted: IndexedSeq[T], buckets: Int): IndexedSeq[T] =
    (1 until buckets).map { i =>
      // Long math: i * length overflows Int past ~2^18 buckets
      sorted(math.min(sorted.length - 1L, i.toLong * sorted.length / buckets).toInt)
    }

  private def bucketOfDouble(bounds: Array[Double], v: Double): Int = {
    var lo = 0; var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (v < bounds(mid)) hi = mid else lo = mid + 1
    }
    lo
  }

  private def bucketOfString(bounds: Array[String], v: String): Int = {
    var lo = 0; var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (v < bounds(mid)) hi = mid else lo = mid + 1
    }
    lo
  }

  /** Interleave `bits`-wide bucket ids (MSB first) into one Morton code. */
  private def morton(ids: Array[Int], bits: Int): Long = {
    var out = 0L
    var bit = bits - 1
    while (bit >= 0) {
      var j = 0
      while (j < ids.length) {
        out = (out << 1) | ((ids(j) >>> bit) & 1)
        j += 1
      }
      bit -= 1
    }
    out
  }

  /** [[zorderBy]] with the file count derived from Catalyst's
    * optimized-plan size statistics, exactly like [[OptimizeWrite.sized]]
    * — one call sites both decisions (how many files, and how rows
    * cluster into them). */
  def zorderSized(df: DataFrame, cols: Seq[String],
                  targetBytes: Long = 128L << 20, bits: Int = 12,
                  sampleN: Int = 10000, seed: Long = 42L): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val estBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val files = (estBytes / BigInt(targetBytes)).max(1).min(200000).toInt
    zorderBy(df, cols, files, bits, sampleN, seed)
  }

  /** Re-shape `df` into `numFiles` Z-ordered output partitions over
    * `cols`. Nulls rank into bucket 0. Returns a DataFrame with the input
    * schema — call `.write` on it. */
  def zorderBy(df: DataFrame, cols: Seq[String], numFiles: Int,
               bits: Int = 12, sampleN: Int = 10000,
               seed: Long = 42L): DataFrame = {
    require(cols.nonEmpty, "zorderBy: need at least one column")
    require(numFiles > 0, "zorderBy: numFiles must be positive")
    require(bits > 0 && cols.length * bits <= 63,
      s"zorderBy: ${cols.length} cols × $bits bits exceeds the 63-bit Morton key")
    // ranks come from a ≤ sampleN sample, so finer than log2(sampleN)
    // bits is pure noise — and 1 << bits wraps an Int at 31+
    require(bits <= 20,
      s"zorderBy: $bits rank bits exceeds the 20-bit sample resolution cap")
    val buckets = 1 << bits

    // rankable projection: everything orderable-numeric goes through
    // double; strings stay strings; anything else is unsupported (binary
    // and complex types have no meaningful linear order to exploit)
    val rankCols: Seq[(String, Column, Boolean)] = cols.map { c =>
      df.schema(c).dataType match {
        case _: NumericType => (c, col(c).cast(DoubleType), false)
        case DateType | TimestampType | TimestampNTZType =>
          (c, col(c).cast(TimestampType).cast(DoubleType), false)
        case StringType => (c, col(c), true)
        case dt => throw new IllegalArgumentException(
          s"zorderBy: unsupported type $dt for column $c")
      }
    }

    val sample = df
      .select(rankCols.map { case (n, e, _) => e.as(n) }: _*)
      .orderBy(xxhash64(lit(seed) +: cols.map(col): _*).asc)
      .limit(sampleN)
      .collect()

    if (sample.isEmpty) return df // nothing to lay out

    // per-column boundary arrays from the sample's sorted non-null values
    val dblBounds = new Array[Array[Double]](cols.length)
    val strBounds = new Array[Array[String]](cols.length)
    rankCols.zipWithIndex.foreach { case ((_, _, isStr), i) =>
      if (isStr) {
        val vs = sample.flatMap(r => Option(r.getString(i))).sorted
        strBounds(i) =
          if (vs.isEmpty) Array.empty
          else boundariesOf(vs.toIndexedSeq, buckets).toArray
      } else {
        val vs = sample.flatMap(r =>
          if (r.isNullAt(i)) None else Some(r.getDouble(i))).sorted
        dblBounds(i) =
          if (vs.isEmpty) Array.empty
          else boundariesOf(vs.toIndexedSeq, buckets).toArray
      }
    }

    // one typed bucket udf per column (Row-input udfs have no encoder),
    // then a Morton udf over the id array
    val bucketCols: Seq[Column] = rankCols.zipWithIndex.map {
      case ((_, e, true), i) =>
        val bounds = strBounds(i)
        udf { (s: String) =>
          if (s == null) 0 else bucketOfString(bounds, s)
        }.apply(e)
      case ((_, e, false), i) =>
        val bounds = dblBounds(i)
        udf { (d: java.lang.Double) =>
          if (d == null) 0 else bucketOfDouble(bounds, d.doubleValue())
        }.apply(e)
    }
    val mortonUdf = udf { (ids: Seq[Int]) => morton(ids.toArray, bits) }

    val zcol = "__graft_zorder"
    // withColumn REPLACES a same-named input column and drop() would then
    // remove the user's data — refuse rather than corrupt the schema
    require(!df.columns.contains(zcol),
      s"zorderBy: input already has a column named $zcol")
    df.withColumn(zcol, mortonUdf(array(bucketCols: _*)))
      .repartitionByRange(numFiles, col(zcol))
      .sortWithinPartitions(zcol)
      .drop(zcol)
  }
}

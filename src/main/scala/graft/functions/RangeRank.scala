package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-phase distributed global rank — the 100 TB form of
  * `row_number() OVER (ORDER BY ...)` that a single-partition WindowExec
  * cannot provide (PlanDoctor's "global-window" risk, and the shape the
  * engine's scaladocs have pointed at since round 6 as "two-phase range
  * ranks"):
  *
  *   1. range-repartition on the sort key (Spark's RangePartitioner —
  *      deterministically seeded sampling picks the boundaries, every
  *      partition holds a contiguous key range);
  *   2. rank WITHIN each partition (WindowExec partitioned by the
  *      materialized partition id — parallel, no single-partition move);
  *   3. add each partition's start offset (the running sum of partition
  *      counts — a numPartitions-row relation, broadcast back).
  *
  * The result is exactly `row_number` over the TOTAL order of
  * `sortCols` — partition boundaries cannot change it, only where the
  * work happens — so callers (q_auc) hash-match oracles that use a plain
  * window. Ranks are only well-defined if `sortCols` is a total order:
  * pass a unique tiebreak column last.
  */
object RangeRank {

  /** `df` plus `rankName` = 1-based global rank by `sortCols`.
    * `partitions` defaults to the session's shuffle partitions. */
  def withRank(df: DataFrame, sortCols: Seq[Column], rankName: String,
               partitions: Int = 0): DataFrame = {
    require(!df.columns.contains(rankName), s"column $rankName exists")
    Seq("__rr_pid", "__rr_rn", "__rr_off", "__rr_n").foreach { c =>
      require(!df.columns.contains(c), s"reserved column $c exists in input")
    }
    val spark = df.sparkSession
    val p =
      if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = df.repartitionByRange(p, sortCols: _*)
      .withColumn("__rr_pid", spark_partition_id())
    // materialize ONCE: the partition-id column must agree between the
    // offsets relation and the ranked relation (recomputation could
    // re-sample boundaries; one lineage cut removes the hazard)
    val pinned = Materialize(ranged)
    val offsets = pinned.groupBy("__rr_pid")
      .agg(count(lit(1)).as("__rr_n"))
      .withColumn("__rr_off",
        coalesce(sum(col("__rr_n")).over(
          Window.orderBy("__rr_pid")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__rr_pid", "__rr_off")
    // the offsets window is numPartitions-sized — bounded by config, not
    // by data; the per-partition window below is keyed on __rr_pid
    pinned
      .withColumn("__rr_rn", row_number().over(
        Window.partitionBy("__rr_pid").orderBy(sortCols: _*)))
      .join(broadcast(offsets), Seq("__rr_pid"))
      .withColumn(rankName, col("__rr_off") + col("__rr_rn"))
      .drop("__rr_pid", "__rr_rn", "__rr_off")
  }
}

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
  *
  * Round 13 generalizes the same machinery two ways (round-12 verdict
  * task #1 — the last corpus-proportional single-task window plans in
  * the registry were q_rfm / q_hist_equidepth / q_pareto_8020, which
  * carried "swap in two-phase ranks at 100 TB" comments while this file
  * sat beside them):
  *
  *   - GROUPED ranks ([[withGroupedRank]]): rank within each group of a
  *     low-cardinality partition key whose groups are each too BIG for
  *     one window task (q_hist_equidepth's 3 return flags over fact
  *     grain). Range-partitioning on (group ++ sort) keeps every
  *     partition a contiguous slice OF one or more groups, and the
  *     offset pass runs per (partition, group) — still bounded by
  *     numPartitions × |groups|.
  *   - RUNNING SUMS (`sumCols`): a per-range prefix sum plus the same
  *     broadcast offset join gives `SUM(v) OVER (ORDER BY ... ROWS
  *     UNBOUNDED PRECEDING)` exactly (q_pareto_8020's cumulative
  *     revenue), with integer-exact totals when `v` is integral.
  *
  * [[ntileFromRank]] then derives NTILE(k) as a pure integer formula
  * over (rank, group row count) — no third phase needed.
  */
object RangeRank {

  /** `df` plus `rankName` = 1-based global rank by `sortCols`.
    * `partitions` defaults to the session's shuffle partitions. */
  def withRank(df: DataFrame, sortCols: Seq[Column], rankName: String,
               partitions: Int = 0): DataFrame =
    withGroupedRank(df, Nil, sortCols, rankName, Seq.empty, partitions)

  /** The generalized two-phase pass. `groupCols` (possibly empty =
    * global) name the PARTITION BY key; `sortCols` the total order
    * within each group (include a unique tiebreak). Each `(valueCol,
    * cumName)` in `sumCols` adds the INCLUSIVE running sum of
    * `valueCol` over that order. Output = input columns + `rankName`
    * (+ each `cumName`). */
  def withGroupedRank(df: DataFrame, groupCols: Seq[String],
                      sortCols: Seq[Column], rankName: String,
                      sumCols: Seq[(String, String)] = Seq.empty,
                      partitions: Int = 0): DataFrame = {
    val reserved = Seq("__rr_pid", "__rr_rn", "__rr_off", "__rr_n") ++
      sumCols.map { case (_, cum) => s"__rr_soff_$cum" } ++
      sumCols.map { case (_, cum) => s"__rr_run_$cum" }
    (rankName +: (reserved ++ sumCols.map(_._2))).foreach { c =>
      require(!df.columns.contains(c), s"column $c exists in input")
    }
    // partitions = 0 (the default) leaves the range shuffle's width to
    // AQE: a small entity-grain relation coalesces to a handful of
    // tasks (fixture-scale constants stay near the single-window
    // plan's), while a corpus-grain relation spreads by the advisory
    // partition size — the knob a 100 TB run would want anyway.
    // Coalescing merges ADJACENT range partitions, so partition ids
    // stay ordered by the sort key and the offset arithmetic is
    // unaffected; the materialization below pins whatever width AQE
    // chose.
    val rangeExprs = groupCols.map(col) ++ sortCols
    val ranged = (if (partitions > 0)
        df.repartitionByRange(partitions, rangeExprs: _*)
      else df.repartitionByRange(rangeExprs: _*))
      .withColumn("__rr_pid", spark_partition_id())
    // materialize ONCE: the partition-id column must agree between the
    // offsets relation and the ranked relation (recomputation could
    // re-sample boundaries; one lineage cut removes the hazard)
    val pinned = Materialize(ranged)
    // per-(partition, group) totals → running offsets per group. The
    // offsets window is (numPartitions × |groups|)-sized — bounded by
    // config and the group key's cardinality, not by data volume.
    val perPart = pinned.groupBy("__rr_pid", groupCols: _*)
      .agg(count(lit(1)).as("__rr_n"),
        sumCols.map { case (v, cum) =>
          sum(col(v)).as(s"__rr_psum_$cum") }: _*)
    val offW = Window.partitionBy(groupCols.map(col): _*)
      .orderBy("__rr_pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sumCols.foldLeft(
      perPart.withColumn("__rr_off",
        coalesce(sum(col("__rr_n")).over(offW), lit(0L)))) {
      case (acc, (_, cum)) => acc.withColumn(s"__rr_soff_$cum",
        coalesce(sum(col(s"__rr_psum_$cum")).over(offW), lit(0L)))
    }.select(col("__rr_pid") +: (groupCols.map(col) :+ col("__rr_off")) ++:
      sumCols.map { case (_, cum) => col(s"__rr_soff_$cum") }: _*)
    // per-(partition, group) window: parallel, never single-partition
    val inW = Window.partitionBy(("__rr_pid" +: groupCols).map(col): _*)
      .orderBy(sortCols: _*)
    val withLocal = sumCols.foldLeft(
      pinned.withColumn("__rr_rn", row_number().over(inW))) {
      case (acc, (v, cum)) => acc.withColumn(s"__rr_run_$cum",
        sum(col(v)).over(
          inW.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    }
    val joined = withLocal
      .join(broadcast(offsets), "__rr_pid" +: groupCols)
      .withColumn(rankName, col("__rr_off") + col("__rr_rn"))
    sumCols.foldLeft(joined) { case (acc, (_, cum)) =>
      acc.withColumn(cum, col(s"__rr_soff_$cum") + col(s"__rr_run_$cum"))
    }.drop(reserved ++ sumCols.map { case (_, c) => s"__rr_psum_$c" }: _*)
  }

  /** `df` plus each group's total row count as `countName` — the NTILE
    * denominator, computed as a grouped aggregate + broadcast join
    * (never a whole-partition window). `groupCols` empty = the global
    * count on every row. */
  def withGroupCount(df: DataFrame, groupCols: Seq[String],
                     countName: String): DataFrame = {
    require(!df.columns.contains(countName), s"column $countName exists")
    if (groupCols.isEmpty)
      df.crossJoin(broadcast(df.agg(count(lit(1)).as(countName))))
    else {
      val counts = df.groupBy(groupCols.map(col): _*)
        .agg(count(lit(1)).as(countName))
      df.join(broadcast(counts), groupCols)
    }
  }

  /** SQL NTILE(k) as a pure integer formula over a 1-based total-order
    * `rank` and the group's row count `n`: the first `n % k` buckets
    * hold `n/k + 1` rows, the rest `n/k` — exactly the standard's
    * distribution, so results hash-match a window NTILE with the same
    * (total) ORDER BY. All-integer arithmetic; the `otherwise` divisor
    * is guarded for the n < k case (where every row lands in the first
    * branch and q = 0 is never used). */
  def ntileFromRank(rank: Column, n: Column, k: Int): Column = {
    val q = idiv(n, lit(k.toLong))
    val rem = n % k
    when(rank <= rem * (q + lit(1)), idiv(rank - 1, q + lit(1)) + 1)
      .otherwise(rem + idiv(rank - lit(1) - rem * (q + lit(1)),
        greatest(q, lit(1L))) + 1)
  }

  /** EXACT integer division of nonnegative longs. Spark's Column `/` is
    * DOUBLE division even on integral inputs, and truncating its result
    * can misround near representability limits (a quotient a hair below
    * an integer rounds up to it, so the truncation lands one too high).
    * Subtracting the remainder first makes the numerator an exact
    * multiple of the divisor, and IEEE division of exactly-divisible
    * integers ≤ 2^53 is exact — the cast is then lossless. */
  private def idiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")
}

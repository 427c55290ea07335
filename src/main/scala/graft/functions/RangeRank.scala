package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-phase distributed global rank — the 100 TB form of
  * `row_number() OVER (ORDER BY ...)` that a single-partition WindowExec
  * cannot provide (PlanDoctor's "global-window" risk, and the shape the
  * engine's scaladocs have pointed at since round 6 as "two-phase range
  * ranks"):
  *
  *   1. bucket every row by BINARY SEARCH against P-1 equi-depth split
  *      points of the primary sort key (collected once, embedded as
  *      literals — see below for why not RangePartitioner);
  *   2. rank WITHIN each bucket (WindowExec partitioned by the bucket id
  *      — parallel, no single-partition move);
  *   3. add each bucket's start offset (the running sum of bucket
  *      counts — a ≤ P×|groups|-row relation, broadcast back).
  *
  * The result is exactly `row_number` over the TOTAL order of
  * `sortCols` — bucket boundaries cannot change it, only where the work
  * happens — so callers (q_auc) hash-match oracles that use a plain
  * window. Ranks are only well-defined if `sortCols` is a total order:
  * pass a unique tiebreak column last.
  *
  * Round 13 (optimization round) replaced the original
  * `repartitionByRange` + `spark_partition_id()` + localCheckpoint
  * implementation: RangePartitioner SAMPLES its boundaries per physical
  * execution, so the partition-id column had to be pinned with an eager
  * localCheckpoint to keep the offsets pass and the rank pass agreeing —
  * at fact grain that checkpoint materialized the whole relation to
  * executor storage (the guide's §5 "don't cache base tables" smell) and
  * at entity grain its fixed job cost dominated (q_rfm: 3 rank passes =
  * 3 sampling jobs + 3 checkpoints + 3 broadcasts ≈ 8× the retired
  * single-window plan at sf0.1). The boundaries are now computed ONCE
  * with `percentile_approx` (one aggregate pass), collected (≤ P-1 rows
  * per group — driver-bounded by construction) and embedded as literals:
  * the bucket id becomes a pure, deterministic row function, safe under
  * any recomputation, so NO lineage cut is needed and the relation is
  * never materialized. Boundary QUALITY only affects balance, never
  * correctness: equi-depth split points are exactly what a
  * RangePartitioner approximates anyway. A single hot key still floods
  * one bucket — the same property the range shuffle had.
  *
  * Generalizations kept from the build rounds:
  *   - GROUPED ranks ([[withGroupedRank]]): rank within each group of a
  *     low-cardinality partition key whose groups are each too BIG for
  *     one window task (q_hist_equidepth's 3 return flags over fact
  *     grain). Boundaries are computed per group; the offset pass runs
  *     per (bucket, group) — still bounded by P × |groups|.
  *   - RUNNING SUMS (`sumCols`): a per-bucket prefix sum plus the same
  *     broadcast offset join gives `SUM(v) OVER (ORDER BY ... ROWS
  *     UNBOUNDED PRECEDING)` exactly (q_pareto_8020's cumulative
  *     revenue), with integer-exact totals when `v` is integral.
  *   - `countName`: each group's total row count (the NTILE denominator)
  *     read off the offsets relation for free — no separate
  *     count-aggregate pass or extra broadcast join.
  *   - `pin`: eagerly materialize the INPUT once when it is expensive to
  *     recompute (q_auc's cosine-scored candidates) — the boundary,
  *     count and rank passes each read it. Leave false when the input is
  *     a cheap scan or already checkpointed: re-deriving narrow rows
  *     twice beats storing the relation (guide §5).
  *
  * [[ntileFromRank]] then derives NTILE(k) as a pure integer formula
  * over (rank, group row count) — no third phase needed.
  *
  * Contract: the PRIMARY sort key must be a type `percentile_approx`
  * sketches (numeric / date / timestamp — every engine call site ranks
  * on scaled-integer scores or cents), and `groupCols`, when present,
  * must be low-cardinality (the per-group boundary collect is
  * |groups| × (P-1) values on the driver).
  */
object RangeRank {

  /** `df` plus `rankName` = 1-based global rank by `sortCols`.
    * `partitions` defaults to the session's shuffle partitions. */
  def withRank(df: DataFrame, sortCols: Seq[Column], rankName: String,
               partitions: Int = 0, pin: Boolean = false): DataFrame =
    withGroupedRank(df, Nil, sortCols, rankName, Seq.empty, partitions,
      pin = pin)

  /** The generalized two-phase pass. `groupCols` (possibly empty =
    * global) name the PARTITION BY key; `sortCols` the total order
    * within each group (include a unique tiebreak). Each `(valueCol,
    * cumName)` in `sumCols` adds the INCLUSIVE running sum of
    * `valueCol` over that order. `countName`, when non-null, adds each
    * group's total row count. Output = input columns + `rankName`
    * (+ each `cumName`, + `countName`).
    *
    * INPUT-DETERMINISM CONTRACT: with `pin = false` the offsets pass and
    * the rank pass each recompute `df` — the bucket ids themselves are
    * deterministic (boundaries are collected literals), but if `df`
    * draws different ROWS per execution (sample/limit/rand lineage) the
    * two passes disagree and ranks silently duplicate or skip. Pass a
    * deterministic input, or set `pin = true` to materialize it once
    * (also the right call when the input is merely expensive — q_auc's
    * cosine-scored candidates). */
  def withGroupedRank(df: DataFrame, groupCols: Seq[String],
                      sortCols: Seq[Column], rankName: String,
                      sumCols: Seq[(String, String)] = Seq.empty,
                      partitions: Int = 0,
                      countName: String = null,
                      pin: Boolean = false): DataFrame = {
    val reserved = Seq("__rr_bkt", "__rr_rn", "__rr_off", "__rr_n",
      "__rr_bnds") ++ groupCols.map(c => s"__rr_g_$c") ++
      sumCols.map { case (_, cum) => s"__rr_soff_$cum" } ++
      sumCols.map { case (_, cum) => s"__rr_run_$cum" }
    (rankName +: (Option(countName).toSeq ++ reserved ++
      sumCols.map(_._2))).foreach { c =>
      require(!df.columns.contains(c), s"column $c exists in input")
    }
    val spark = df.sparkSession
    val input = if (pin) Materialize(df) else df
    val p = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions

    // primary sort key + direction + null placement (the bucket id only
    // needs the FIRST sort column: equal primary keys always land in one
    // bucket, and the in-bucket window orders by the full sortCols)
    val (keyCol, asc, nullsFirst) =
      org.apache.spark.sql.graftbridge.PlanBridge.sortOrderOf(sortCols.head)

    // P-1 equi-depth split points of the DOUBLE-cast key, per group,
    // from ONE aggregate pass over a DETERMINISTIC 1-in-64 row sample
    // (hash of the full sort key, so replays draw the same rows),
    // collected to the driver — deterministic under recomputation by
    // construction (they become constants). Sampling matters:
    // percentile_approx is a per-row TypedImperativeAggregate (no
    // codegen), so sketching every fact row cost more than the rank
    // pass it was placing. Boundary QUALITY only affects balance, never
    // correctness (the double cast is monotone for every numeric key —
    // ties can only collapse, keeping buckets contiguous), and 64 × P
    // samples per split point is plenty; if the sample misses a group
    // entirely (tiny inputs), that group lands in one bucket — exactly
    // the single-window plan such inputs want.
    val sortKeyCols = sortCols.map(c =>
      org.apache.spark.sql.graftbridge.PlanBridge.sortOrderOf(c)._1)
    val keyD = keyCol.cast("double")
    val sampled = input.filter(
      pmod(xxhash64(sortKeyCols: _*), lit(64)) === 0)
    val probs = array((1 until p).map(i => lit(i.toDouble / p)): _*)
    val bndAgg = percentile_approx(keyD, probs, lit(10000))
      .as("__rr_bnds")
    def collectBnds(row: org.apache.spark.sql.Row, at: Int): Array[Double] =
      if (row.isNullAt(at)) Array.empty[Double]
      else row.getSeq[Any](at).collect { case d: Double => d }
        // NaN split points carry no boundary information (BucketIndex
        // maps NaN KEYS to +Infinity to match Spark's NaN-greatest sort)
        .filter(d => !java.lang.Double.isNaN(d))
        .distinct.sorted.toArray
    // The bucket id = count of split points strictly before the key in
    // sort order — a native binary-search expression (BucketIndex; a
    // when-chain over P-1 literals per group blows the JIT's method
    // limit and an array HOF runs interpreted — both measured ~10× the
    // scan they decorate). Monotone in the sort order, so every bucket
    // holds a contiguous key range and offsets reconstruct the total
    // order. NULL keys take the end bucket their null ordering
    // dictates; same-bucket ordering is the window's job.
    def bucketCol(gIdx: Column, splits: Array[Array[Double]]): Column =
      org.apache.spark.sql.graftbridge.PlanBridge.column(BucketIndex(
        org.apache.spark.sql.graftbridge.PlanBridge.expression(
          gIdx.cast("int")),
        org.apache.spark.sql.graftbridge.PlanBridge.expression(keyD),
        splits, asc, if (nullsFirst) 0 else p - 1))

    val bucketed =
      if (p < 2) input.withColumn("__rr_bkt", lit(0))
      else if (groupCols.isEmpty) {
        val arr = collectBnds(sampled.agg(bndAgg).collect()(0), 0)
        input.withColumn("__rr_bkt", bucketCol(lit(0), Array(arr)))
      } else {
        // per-group splits, selected by a |groups|-branch group-index
        // chain (null-safe equality); the collect is |groups| rows —
        // bounded by the low-cardinality groupCols contract, the same
        // bound the offsets broadcast relies on. The LAST splits slot is
        // empty: the fallback for groups the sample missed.
        val bndRows = sampled.groupBy(groupCols.map(col): _*).agg(bndAgg)
          .collect()
        val splits = bndRows.map(collectBnds(_, groupCols.size)) :+
          Array.empty[Double]
        def litOf(v: Any, dt: org.apache.spark.sql.types.DataType): Column =
          org.apache.spark.sql.graftbridge.PlanBridge.column(
            Literal.create(v, dt))
        val gIdx = bndRows.zipWithIndex
          .foldLeft(lit(bndRows.length): Column) { case (acc, (row, i)) =>
            val cond = groupCols.zipWithIndex.map { case (c, j) =>
              col(c) <=> litOf(row.get(j), input.schema(c).dataType)
            }.reduce(_ && _)
            when(cond, lit(i)).otherwise(acc)
          }
        input.withColumn("__rr_bkt", bucketCol(gIdx, splits))
      }

    // per-(bucket, group) totals → running offsets per group (and the
    // group total for countName). Bounded by P × |groups| rows — never
    // data volume. The bucket id is deterministic, so this second pass
    // over the input needs no pinning to agree with the rank pass.
    val perPart = bucketed.groupBy("__rr_bkt", groupCols: _*)
      .agg(count(lit(1)).as("__rr_n"),
        sumCols.map { case (v, cum) =>
          sum(col(v)).as(s"__rr_psum_$cum") }: _*)
    val offW = Window.partitionBy(groupCols.map(col): _*)
      .orderBy("__rr_bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val grpW = Window.partitionBy(groupCols.map(col): _*)
    val withOff = sumCols.foldLeft(
      perPart.withColumn("__rr_off",
        coalesce(sum(col("__rr_n")).over(offW), lit(0L)))) {
      case (acc, (_, cum)) => acc.withColumn(s"__rr_soff_$cum",
        coalesce(sum(col(s"__rr_psum_$cum")).over(offW), lit(0L)))
    }
    val offsets = (if (countName == null) withOff
      else withOff.withColumn(countName, sum(col("__rr_n")).over(grpW)))
      .select(col("__rr_bkt") +:
        (groupCols.map(col) :+ col("__rr_off")) ++:
        Option(countName).map(col).toSeq ++:
        sumCols.map { case (_, cum) => col(s"__rr_soff_$cum") }: _*)

    // per-(bucket, group) window: parallel, never single-partition
    val inW = Window.partitionBy(("__rr_bkt" +: groupCols).map(col): _*)
      .orderBy(sortCols: _*)
    val withLocal = sumCols.foldLeft(
      bucketed.withColumn("__rr_rn", row_number().over(inW))) {
      case (acc, (v, cum)) => acc.withColumn(s"__rr_run_$cum",
        sum(col(v)).over(
          inW.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    }
    val joined = withLocal
      .join(broadcast(offsets), "__rr_bkt" +: groupCols)
      .withColumn(rankName, col("__rr_off") + col("__rr_rn"))
    sumCols.foldLeft(joined) { case (acc, (_, cum)) =>
      acc.withColumn(cum, col(s"__rr_soff_$cum") + col(s"__rr_run_$cum"))
    }.drop(reserved ++ sumCols.map { case (_, c) => s"__rr_psum_$c" }: _*)
  }

  /** `df` plus each group's total row count as `countName` — the NTILE
    * denominator, computed as a grouped aggregate + broadcast join
    * (never a whole-partition window). `groupCols` empty = the global
    * count on every row. Prefer `withGroupedRank(countName = ...)` when
    * a rank pass runs anyway — it reads the count off the offsets
    * relation for free. */
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

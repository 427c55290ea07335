package graft.sources

import org.apache.spark.sql.DataFrame

/** Output-file sizing — the small-files control for large-scale writes.
  *
  * A 1000-executor job that writes its natural partitioning produces one
  * file per task per partition key: at 100 TB that is millions of tiny
  * files, and every downstream scan pays the open/footer cost per file.
  * The fix is to re-shape the final stage so each task writes ~one
  * target-sized file.
  *
  * Sizing uses Catalyst's optimized-plan statistics (parquet footer
  * sizes propagated through the plan — no data scan). Shrinking uses
  * `coalesce` (narrow, no shuffle); growing uses `repartition` (one
  * shuffle, but only when the plan genuinely has too few partitions to
  * write the target size).
  */
object OptimizeWrite {

  /** Re-shape `df` so each output partition carries ~`targetBytes` of
    * (estimated, uncompressed-plan) data. Call immediately before
    * `.write`. */
  def sized(df: DataFrame, targetBytes: Long = 128L << 20): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val estBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    // stats can be a huge sentinel when unknown — cap to something sane
    val parts = (estBytes / BigInt(targetBytes)).max(1).min(200000).toInt
    val current = df.rdd.getNumPartitions
    if (parts < current) df.coalesce(parts)
    else if (parts > current) df.repartition(parts)
    else df
  }
}

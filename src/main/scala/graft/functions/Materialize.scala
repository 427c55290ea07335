package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}

/** Lineage-cutting materialization for derived relations that are consumed
  * more than once (self-join sides, iterative label relations, multi-branch
  * graph scans).
  *
  * Default = `localCheckpoint(eager)`: blocks stored on executors, fast, no
  * extra I/O — right for a single-JVM harness and for short-lived derived
  * relations. It is NOT fault-tolerant: blocks are pinned to live executors,
  * so losing one mid-job recomputes nothing — the job fails. At 100 TB on a
  * 1000-executor cluster, executor loss is routine, so long pipelines flip
  * `spark.graft.reliableCheckpoints=true` (plus
  * `SparkContext.setCheckpointDir` to a durable store) and the SAME call
  * sites write reliable `checkpoint()`s instead: the derived relation
  * persists to storage and survives executor loss, at the cost of one
  * write+read round-trip — exactly the "write the derived relation to
  * storage" production pattern the dedup-family scale notes describe.
  *
  * Reliable checkpoints are NOT auto-deleted: Spark removes a superseded
  * checkpoint only under `spark.cleaner.referenceTracking.cleanCheckpoints
  * =true` (and only when the RDD is garbage-collected). A long fixpoint
  * loop — DedupClusters label propagation materializes the labels relation
  * every round — otherwise accumulates one full copy per round in the
  * checkpoint dir. For long reliable runs set that cleaner conf, or point
  * setCheckpointDir at a per-job path and delete it after the job.
  */
object Materialize {

  val confKey = "spark.graft.reliableCheckpoints"

  def reliableRequested(df: DataFrame): Boolean =
    df.sparkSession.conf.get(confKey, "false").toBoolean

  /** Materialize df eagerly and cut its lineage; conf picks the mode. */
  def apply(df: DataFrame): DataFrame = apply(df, reliableRequested(df))

  def apply(df: DataFrame, reliable: Boolean): DataFrame =
    if (reliable) {
      require(
        df.sparkSession.sparkContext.getCheckpointDir.isDefined,
        s"$confKey=true needs SparkContext.setCheckpointDir(<durable path>)")
      df.checkpoint(eager = true)
    } else df.localCheckpoint(eager = true)

  /** Floor a relation's parallelism at the session's default: a corpus
    * read from one parquet file (or any narrow lineage) arrives as ONE
    * partition, and everything downstream that doesn't shuffle —
    * broadcast-join stream sides, per-row scoring, codegen-fallback
    * expression evaluation — inherits that single task no matter how many
    * cores the cluster has (measured: CosineLsh's whole sf1 verify join
    * on one core). One linear round-robin exchange restores parallelism;
    * skipped when the input is already spread. */
  private[graft] def spread[T](ds: Dataset[T]): Dataset[T] = {
    // .rdd forces physical planning (and throws on a streaming Dataset) —
    // streaming relations get their parallelism from the source, skip them
    if (ds.isStreaming) return ds
    val want = ds.sparkSession.sparkContext.defaultParallelism
    if (ds.rdd.getNumPartitions < want) ds.repartition(want) else ds
  }
}

package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate CLUSTERING: turn a pair list (from MinHashDedup /
  * CosineLsh / SimHash candidates) into connected components and a
  * canonical-survivor corpus. Pair detection alone under-deletes: with
  * docs A≈B, B≈C but A̸≈C, deleting one doc per PAIR can still keep two
  * near-identical docs — the component {A,B,C} must collapse to one
  * survivor. This is the last stage of every production dedup pipeline.
  *
  * Algorithm: iterative min-label propagation. Every node starts labeled
  * with its own id; each round a node takes the minimum label in its
  * closed neighborhood; fixpoint = every component labeled by its minimum
  * id. Rounds needed = O(component diameter) — near-dup components are
  * small and dense in practice, so a handful of rounds suffices; maxIter
  * bounds the worst case.
  *
  * Scale notes:
  *   - each round is one equi-join on node id + one hash aggregate — the
  *     same shuffle shape as a word count; nothing driver-sized.
  *   - labels are localCheckpoint'ed every round: iterative DataFrames
  *     otherwise grow their lineage/plan exponentially.
  *   - convergence is checked with a scalar SUM(label) per round (labels
  *     only decrease, so an unchanged sum IS the fixpoint) — one tiny
  *     driver scalar, not a data collect.
  */
object DedupClusters {

  /** Connected components of the undirected pair graph.
    *
    * @param pairs columns (aCol, bCol) — one row per detected pair
    * @return (id, cluster) where cluster = min node id in the component
    */
  /** @param hopsPerRound label-propagation joins per checkpoint round:
    *   1 = classic; 2 = two-hop (halves the checkpoint/action overhead
    *   per covered hop — helps when rounds are overhead-bound, i.e.
    *   small graphs; same fixpoint either way)
    * @param reliable write per-round checkpoints to the configured
    *   SparkContext checkpoint dir instead of executor-pinned
    *   localCheckpoints — the fault-tolerant mode for long-running
    *   100 TB jobs (see [[Materialize]]); also switched on globally by
    *   spark.graft.reliableCheckpoints=true. Same fixpoint either way. */
  def connectedComponents(pairs: DataFrame, aCol: String = "a_id",
                          bCol: String = "b_id",
                          maxIter: Int = 20,
                          hopsPerRound: Int = 1,
                          reliable: Boolean = false): DataFrame = {
    val rel = reliable || Materialize.reliableRequested(pairs)
    val edges = Materialize( // reused every round — cut it off the source plan
      pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
        .unionAll(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
        .distinct(), rel)
    var labels = Materialize(edges.select(col("src").as("id")).distinct()
      .withColumn("cluster", col("id")), rel)
    var prevSum = labels.agg(sum("cluster")).head().getLong(0)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      var next = labels
      for (_ <- 1 to hopsPerRound) {
        val viaNeighbors = edges.join(next, edges("dst") === next("id"))
          .select(edges("src").as("id"), col("cluster"))
        next = next.unionAll(viaNeighbors)
          .groupBy("id").agg(min("cluster").as("cluster"))
      }
      labels = Materialize(next, rel)
      val s = labels.agg(sum("cluster")).head().getLong(0)
      converged = s == prevSum
      prevSum = s
      i += 1
    }
    labels
  }

  /** Collapse a corpus to canonical survivors: for every component keep
    * the minimum-id row; rows in no pair survive untouched. */
  def keepCanonical(df: DataFrame, idCol: String,
                    pairs: DataFrame): DataFrame = {
    val comps = connectedComponents(pairs)
    df.join(comps, df(idCol) === comps("id"), "left")
      .filter(col("cluster").isNull || col("cluster") === df(idCol))
      .drop("id", "cluster")
  }
}

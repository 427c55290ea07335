package graft

import java.nio.file.Files

import graft.functions.DedupClusters
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The incremental cluster-maintenance contract (RollupSpec discipline):
  * refreshClusters(clusters(base), delta) must be RELATION-IDENTICAL to
  * connectedComponents(base ∪ delta) — so N daily increments cost N
  * contracted-CC fixpoints over the delta, never N corpus rebuilds — and
  * the persisted flavor (writePersisted → refreshAppended) must keep the
  * stored tables in that same state. q_dedup_persist carries the same
  * proof under the DuckDB oracle gate on the fixture corpus; these specs
  * pin the graph shapes the fixture can't plant. */
class DedupPersistSpec extends SparkSpec {

  import scala.jdk.CollectionConverters._

  private def pairs(ps: Seq[(Long, Long)]): DataFrame =
    spark.createDataFrame(
      ps.map { case (a, b) => org.apache.spark.sql.Row(a, b) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("a_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("b_id",
          org.apache.spark.sql.types.LongType))))

  private def labels(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def assertRefreshEqualsRebuild(base: Seq[(Long, Long)],
                                         delta: Seq[(Long, Long)]): Unit = {
    val old = DedupClusters.connectedComponents(pairs(base))
    val got = labels(DedupClusters.refreshClusters(old, pairs(delta)))
    val want = labels(DedupClusters.connectedComponents(pairs(base ++ delta)))
    assert(got == want, s"refresh=$got rebuild=$want")
  }

  test("refresh ≡ rebuild: delta merges two standing components") {
    assertRefreshEqualsRebuild(
      base = Seq((1L, 2L), (2L, 3L), (10L, 11L)),
      delta = Seq((3L, 10L)))
  }

  test("refresh ≡ rebuild: delta chains MANY components through one batch") {
    // k old components merged by a delta chain — the contracted graph
    // must converge across labels, not just pairwise (star CC inside)
    val base = (0 until 6).map(i => (i * 10L, i * 10L + 1))
    val delta = (0 until 5).map(i => (i * 10L + 1, (i + 1) * 10L))
    assertRefreshEqualsRebuild(base, delta)
  }

  test("refresh ≡ rebuild: new nodes, old-new edges, intra-component edge") {
    assertRefreshEqualsRebuild(
      base = Seq((1L, 2L), (5L, 6L)),
      delta = Seq(
        (100L, 101L), // brand-new component
        (6L, 102L),   // old node gains a new neighbor
        (1L, 2L)))    // re-delivered edge inside an old component (no-op)
  }

  test("refresh ≡ rebuild: untouched components pass through unchanged") {
    val base = Seq((1L, 2L), (10L, 11L), (20L, 21L), (30L, 31L))
    val delta = Seq((2L, 10L))
    assertRefreshEqualsRebuild(base, delta)
    // and explicitly: the untouched labels are byte-identical
    val old = DedupClusters.connectedComponents(pairs(base))
    val ref = labels(DedupClusters.refreshClusters(old, pairs(delta)))
    assert(ref(20L) == 20L && ref(21L) == 20L && ref(30L) == 30L)
  }

  test("refresh with a min-id NEW node relabels the merged component") {
    // the new node is SMALLER than every old label — the merged
    // component's minimum moves to the new node
    assertRefreshEqualsRebuild(
      base = Seq((10L, 11L)),
      delta = Seq((1L, 10L)))
  }

  test("distributed fallback (cap = 0) equals the local union-find path") {
    // refreshClusters runs a bounded driver-side union-find below the
    // contracted-edge cap and distributed star CC above it — force both
    // paths over the same inputs and pin equality
    val base = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L))
    val delta = Seq((3L, 10L), (100L, 101L), (101L, 20L))
    val old = DedupClusters.connectedComponents(pairs(base))
    val local = labels(DedupClusters.refreshClusters(old, pairs(delta)))
    val dist = labels(DedupClusters.refreshClusters(old, pairs(delta),
      localRefreshMaxEdges = 0L))
    assert(local == dist)
    assert(local ==
      labels(DedupClusters.connectedComponents(pairs(base ++ delta))))
  }

  test("persisted roundtrip: writePersisted + refreshAppended ≡ rebuild") {
    val dir = Files.createTempDirectory("graft-dedup-persist").toString
    val base = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L))
    val delta = Seq((3L, 10L), (100L, 101L))
    val written = DedupClusters.writePersisted(
      pairs(base).withColumn("jac", lit(0.9)), dir)
    assert(labels(written) ==
      labels(DedupClusters.connectedComponents(pairs(base))))
    val refreshed = DedupClusters.refreshAppended(
      dir, pairs(delta).withColumn("jac", lit(0.8)))
    val want = labels(DedupClusters.connectedComponents(pairs(base ++ delta)))
    assert(labels(refreshed) == want)
    // the STORED tables are in the refreshed state: clusters match, and
    // the pair audit trail carries base + delta
    assert(labels(DedupClusters.readPersistedClusters(spark, dir)) == want)
    assert(DedupClusters.readPersistedPairs(spark, dir).count() ==
      (base.size + delta.size).toLong)
  }

  test("two successive increments compose: refresh∘refresh ≡ rebuild") {
    // the contract a LIVING corpus actually exercises: N daily batches
    // folded one at a time must land exactly where one rebuild over the
    // full pair set lands — associativity of the contracted merge
    val dir = Files.createTempDirectory("graft-dedup-twice").toString
    val base = Seq((1L, 2L), (10L, 11L), (20L, 21L))
    val d1 = Seq((2L, 10L), (30L, 31L))  // merge + new component
    val d2 = Seq((31L, 20L), (11L, 1L))  // chain across BOTH prior states
    DedupClusters.writePersisted(pairs(base).withColumn("jac", lit(1.0)), dir)
    DedupClusters.refreshAppended(dir, pairs(d1).withColumn("jac", lit(1.0)))
    val after2 = labels(DedupClusters.refreshAppended(
      dir, pairs(d2).withColumn("jac", lit(1.0))))
    val want = labels(
      DedupClusters.connectedComponents(pairs(base ++ d1 ++ d2)))
    assert(after2 == want)
    // the audit trail holds every pair ever folded in
    assert(DedupClusters.readPersistedPairs(spark, dir).count() == 7L)
  }

  test("interrupted refreshAppended: recoverAppended finishes the swap") {
    // replicate refreshAppended's crash windows. Window 0 (clean
    // artifact, no marker, nothing staged): recovery must NO-OP.
    // Window A (marker set, pairs appended, nothing staged — the crash
    // that used to LOSE the delta's merges forever): recovery must
    // rebuild clusters from the full pairs trail. Window B (crash after
    // staging, before the swap): recovery promotes the staged copy —
    // safe only because staging happens AFTER the append, so a
    // completed clusters_next/ proves the trail holds the folded pairs.
    val dir = Files.createTempDirectory("graft-dedup-crash").toString
    val base = Seq((1L, 2L), (10L, 11L))
    val delta = Seq((2L, 10L), (30L, 31L))
    DedupClusters.writePersisted(pairs(base).withColumn("jac", lit(1.0)), dir)
    val oldLabels = labels(DedupClusters.readPersistedClusters(spark, dir))
    val want = labels(DedupClusters.connectedComponents(pairs(base ++ delta)))
    // window 0: clean artifact
    assert(!DedupClusters.recoverAppended(spark, dir),
      "clean artifact: recovery must no-op")
    assert(labels(DedupClusters.readPersistedClusters(spark, dir)) == oldLabels)
    // window A: marker + pairs appended, nothing staged
    new java.io.File(s"$dir/refresh_pending").createNewFile()
    pairs(delta).withColumn("jac", lit(1.0))
      .write.mode("append").parquet(s"$dir/pairs")
    assert(DedupClusters.recoverAppended(spark, dir),
      "pending marker without staging: recovery must rebuild from the trail")
    assert(labels(DedupClusters.readPersistedClusters(spark, dir)) == want,
      "trail rebuild must fold the appended delta's merges in")
    assert(!new java.io.File(s"$dir/refresh_pending").exists(),
      "recovery must clear the intent marker")
    // window B: staging completed, swap not yet run (replay the same
    // refreshed relation onto a reset clusters/ to isolate the window)
    val refreshed = DedupClusters.connectedComponents(pairs(base ++ delta))
    DedupClusters.connectedComponents(pairs(base))
      .write.mode("overwrite").parquet(s"$dir/clusters")
    new java.io.File(s"$dir/refresh_pending").createNewFile()
    refreshed.write.mode("overwrite").parquet(s"$dir/clusters_next")
    assert(labels(DedupClusters.readPersistedClusters(spark, dir)) == oldLabels,
      "live clusters must be untouched before the swap")
    assert(DedupClusters.recoverAppended(spark, dir))
    assert(labels(DedupClusters.readPersistedClusters(spark, dir)) == want)
    assert(!DedupClusters.recoverAppended(spark, dir),
      "second recovery must no-op")
    assert(!new java.io.File(s"$dir/clusters_next").exists())
    assert(!new java.io.File(s"$dir/refresh_pending").exists())
  }

  test("recovery is self-describing on non-default pair columns") {
    // the production dedup artifacts persist pairs as (id_a, id_b) —
    // the trail rebuild must read the artifact's own pair_cols record,
    // not assume the (a_id, b_id) defaults
    val dir = Files.createTempDirectory("graft-dedup-cols").toString
    val p = pairs(Seq((1L, 2L), (10L, 11L)))
      .withColumnRenamed("a_id", "id_a").withColumnRenamed("b_id", "id_b")
    DedupClusters.writePersisted(p, dir, "id_a", "id_b")
    new java.io.File(s"$dir/refresh_pending").createNewFile()
    pairs(Seq((2L, 10L)))
      .withColumnRenamed("a_id", "id_a").withColumnRenamed("b_id", "id_b")
      .write.mode("append").parquet(s"$dir/pairs")
    assert(DedupClusters.recoverAppended(spark, dir))
    val want = labels(DedupClusters.connectedComponents(
      pairs(Seq((1L, 2L), (10L, 11L), (2L, 10L)))))
    assert(labels(DedupClusters.readPersistedClusters(spark, dir)) == want)
  }

  test("refreshAppended heals a surviving crash marker before refreshing") {
    // a prior refresh crashed post-append: its merges live only in the
    // trail. The next refreshAppended must fold them in (via recovery)
    // instead of computing from the stale clusters and clearing the
    // marker — which would lose the crashed delta's merges forever.
    val dir = Files.createTempDirectory("graft-dedup-heal").toString
    DedupClusters.writePersisted(
      pairs(Seq((1L, 2L), (10L, 11L))).withColumn("jac", lit(1.0)), dir)
    // crashed refresh: marker + appended pairs, nothing staged
    new java.io.File(s"$dir/refresh_pending").createNewFile()
    pairs(Seq((2L, 10L))).withColumn("jac", lit(1.0))
      .write.mode("append").parquet(s"$dir/pairs")
    // the NEXT delta arrives through the normal API
    val got = labels(DedupClusters.refreshAppended(dir,
      pairs(Seq((30L, 31L))).withColumn("jac", lit(1.0))))
    val want = labels(DedupClusters.connectedComponents(
      pairs(Seq((1L, 2L), (10L, 11L), (2L, 10L), (30L, 31L)))))
    assert(got == want,
      s"the crashed delta's merge (2-10) must survive: got $got want $want")
    assert(!new java.io.File(s"$dir/refresh_pending").exists())
  }

  test("q_dedup_cluster steady state is an exchange-free artifact scan") {
    // the point of persisting: every consumer reads the stored relation
    // instead of re-deriving it — the executed plan must contain no
    // shuffle except the final orderBy's range partitioning and no
    // text-processing joins at all
    val df = q("q_dedup_cluster")
    df.queryExecution.toRdd.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("HashJoin"),
      s"artifact read path must not join:\n$plan")
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 2, // the sort's range exchange (+ AQE read)
      s"artifact read path shuffles more than the output sort:\n$plan")
  }

  test("increment probe: stored band-key side joins without an Exchange") {
    // the round-11 contract: the base band table is stored BUCKETED by
    // (band, bk), so a delta probe sort-merge-joins it with no Exchange
    // on the stored side — only the arriving keys shuffle
    val base = operators.DedupQueries.incBandsTable(spark, sf)
    import spark.implicits._
    val delta = Seq((999999L, 0, "no|such|key|x")).toDF("doc_id", "band", "bk")
    val j = delta.hint("merge").as("a").join(base.as("b"),
      col("a.band") === col("b.band") && col("a.bk") === col("b.bk"))
    j.queryExecution.toRdd.count()
    // the AQE string repeats the plan under "== Initial Plan ==" — count
    // exchanges in the FINAL plan section only
    val plan = j.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(plan.contains("Bucketed: true"),
      s"stored side must scan as a bucketed table:\n$plan")
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 1, s"only the delta side may shuffle:\n$plan")
  }

  test("q_dedup_persist matches the from-scratch cluster relation") {
    // the incremental path (persisted base + delta arrival) must equal
    // connectedComponents over the full corpus's pair relation — the
    // in-JVM twin of the DuckDB oracle gate
    val got = q("q_dedup_persist").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq
    val want = DedupClusters
      .connectedComponents(
        operators.DedupQueries.minhashPairs(spark, sf), "id_a", "id_b")
      .orderBy("id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }
}

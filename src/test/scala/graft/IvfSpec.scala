package graft

import graft.functions.{IvfIndex, NativeCosine}
import org.apache.spark.sql.functions._

/** IVF approximate nearest neighbor: training determinism, cell
  * partitioning, planted-duplicate recall, and candidate-set bounds. */
class IvfSpec extends SparkSpec {

  private lazy val model =
    IvfIndex.train(table("embeddings"), "embedding", k = 8)

  test("training is deterministic and yields k centroids") {
    val again = IvfIndex.train(table("embeddings"), "embedding", k = 8)
    assert(model.k == 8)
    assert(model.centroids.map(_.toSeq).toSeq ==
      again.centroids.map(_.toSeq).toSeq)
  }

  test("assignment partitions the corpus into non-empty cells") {
    NativeCosine.register(spark)
    val cells = table("embeddings")
      .select(IvfIndex.assign(col("embedding"), model).as("cell"))
      .groupBy("cell").count().collect()
      .map(r => r.getAs[Int]("cell") -> r.getAs[Long]("count")).toMap
    assert(cells.values.sum == table("embeddings").count())
    assert(cells.keys.forall(c => c >= 0 && c < 8))
    assert(cells.size >= 4, s"degenerate clustering: $cells")
  }

  test("probeCells returns nProbe distinct in-range cells, nearest first set") {
    val cells = table("embeddings").limit(20)
      .select(IvfIndex.probeCells(col("embedding"), model, 3).as("cs"))
      .collect().map(_.getSeq[Int](0))
    cells.foreach { cs =>
      assert(cs.length == 3)
      assert(cs.distinct.length == 3)
      assert(cs.forall(c => c >= 0 && c < 8))
    }
  }

  test("planted identical vector is found as the top neighbor") {
    NativeCosine.register(spark)
    val e = table("embeddings").select("vec_id", "embedding")
    val clone = e.filter(col("vec_id") === 5)
      .select(lit(9005L).as("vec_id"), col("embedding"))
    val corpus = e.unionByName(clone)
    val probes = corpus.filter(col("vec_id") === 9005L)
    val top = IvfIndex.topK(corpus, probes, "vec_id", "embedding", model,
      k = 1, nProbe = 2).collect()
    assert(top.length == 1)
    assert(top(0).getAs[Long]("vec_id") == 5L)
    assert(math.abs(top(0).getAs[Double]("cos") - 1.0) < 1e-9)
  }

  test("training sample is unbiased on a sorted corpus (prefix-limit is not)") {
    import spark.implicits._
    // Corpus clustered by storage order: ids 0-199 near (10,0), 200-399
    // near (0,10) — the layout a source/topic-sorted table produces.
    val vecs = (0 until 400).map { i =>
      val base = if (i < 200) Array(10f, 0f, 0f, 0f) else Array(0f, 10f, 0f, 0f)
      (i.toLong, base.zipWithIndex.map { case (v, d) => v + ((i * 7 + d) % 13) * 0.01f })
    }
    val corpus = vecs.toDF("vec_id", "embedding").coalesce(1)
    def regions(m: IvfIndex.Model): Set[String] =
      m.centroids.map(c => if (c(0) > c(1)) "A" else "B").toSet
    // Old prefix behavior (train sees only the first 100 storage rows):
    // every centroid lands in region A — region-B recall collapses.
    val prefix = IvfIndex.train(corpus.limit(100), "embedding", k = 4, sampleN = 100)
    assert(regions(prefix) == Set("A"),
      s"prefix sample unexpectedly escaped the storage prefix: ${regions(prefix)}")
    // Hash-gated sample draws uniformly over the whole corpus: both
    // regions are represented in the centroids despite the sorted layout.
    val hashed = IvfIndex.train(corpus, "embedding", k = 4, sampleN = 100)
    assert(regions(hashed) == Set("A", "B"),
      s"hash sample failed to cover both regions: ${regions(hashed)}")
  }

  test("training sample plans as TakeOrdered (no full sort, bounded collect)") {
    val plan = table("embeddings").select(col("embedding"))
      .orderBy(xxhash64(lit(42L), col("embedding")).asc).limit(1000)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"hash-sample should plan as TakeOrderedAndProject:\n$plan")
  }

  test("on-disk index: cell-partitioned layout, pruned scan, same results") {
    NativeCosine.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    val e = table("embeddings").select("vec_id", "embedding")
    IvfIndex.writeIndex(e, "vec_id", "embedding", model, dir)
    // layout: one directory per cell under cells/ (the index IS the
    // partitioning), with the centroid sidecar as a sibling
    val cellDirs = new java.io.File(dir, "cells").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    assert(cellDirs.nonEmpty, "expected cell= partition directories")
    val probes = e.filter(col("vec_id") < 5)
    val indexed = IvfIndex.topKIndexed(spark, dir, probes,
      "vec_id", "embedding", model, k = 3, nProbe = 2)
    // identical results to the in-memory assignment path
    val direct = IvfIndex.topK(e, probes, "vec_id", "embedding", model,
      k = 3, nProbe = 2)
    assert(indexed.collect().map(_.toSeq).toSet ==
      direct.collect().map(_.toSeq).toSet)
    // and the scan is PRUNABLE on the partition key: the planner sees the
    // cell join key as a partition filter (dynamic pruning from the probe
    // side) rather than reading every cell's files unconditionally
    val plan = indexed.queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("dynamicpruning") ||
      plan.contains("partitionfilters: [isnotnull(cell"),
      s"no partition pruning on the cell key:\n$plan")
  }

  test("appendVectors ≡ rebuild: appended index answers like a full write") {
    NativeCosine.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-app").toString
    val dir2 = java.nio.file.Files.createTempDirectory("graft-ivf-full").toString
    val e = table("embeddings").select("vec_id", "embedding")
    val base = e.filter(col("vec_id") % 5 =!= 4)
    val batch = e.filter(col("vec_id") % 5 === 4)
      // planted twin: an exact copy of probe 0's vector under a new id —
      // the appended index MUST surface it as the probe's top neighbor
      .unionByName(e.filter(col("vec_id") === 0)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
    IvfIndex.writeIndex(base, "vec_id", "embedding", model, dir)
    IvfIndex.appendVectors(dir, batch, "vec_id", "embedding")
    IvfIndex.writeIndex(base.unionByName(batch), "vec_id", "embedding",
      model, dir2)
    val probes = e.filter(col("vec_id") < 5)
    def run(d: String) = IvfIndex.topKIndexed(spark, d, probes,
      "vec_id", "embedding", model, k = 3, nProbe = 2)
      .collect().map(_.toSeq).toSet
    val appended = run(dir)
    assert(appended == run(dir2), "appended index diverges from rebuild")
    // the planted copy lands in probe 0's own cell → always probed first
    assert(appended.exists(r => r.head == 0L && r(2) == 1000000L),
      s"planted appended twin not retrieved: $appended")
  }

  test("removeVectors: takedown ≡ an index the removed vectors never entered") {
    // round-12: delete support for the cell-partitioned family. The
    // centroid model is untouched, so survivors' assignments never
    // change — the compacted cells relation must equal a write that
    // never saw the removed ids, and searches must stop returning them.
    NativeCosine.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-rm").toString
    val dir2 = java.nio.file.Files.createTempDirectory("graft-ivf-rm2").toString
    val e = table("embeddings").select("vec_id", "embedding")
    val rmPred = IncrementContract.isRemoved(col("vec_id"))
    IvfIndex.writeIndex(e, "vec_id", "embedding", model, dir)
    IvfIndex.removeVectors(dir, e.filter(rmPred).select("vec_id"))
    IvfIndex.writeIndex(e.filter(!rmPred), "vec_id", "embedding", model, dir2)
    val a = spark.read.parquet(s"$dir/cells")
    val b = spark.read.parquet(s"$dir2/cells")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "compacted cells diverge from a rebuild without the removed ids")
    // a probe carrying removed-vector 0's EXACT embedding under a new
    // id would have retrieved 0 as its top neighbor pre-compaction
    // (cos 1, own cell); post-compaction it must be gone
    val probes = e.filter(col("vec_id") === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val hits = IvfIndex.topKIndexed(spark, dir, probes,
      "vec_id", "embedding", model, k = 3, nProbe = 2)
      .collect().map(_.toSeq)
    assert(hits.nonEmpty && !hits.exists(_(2) == 0L),
      s"removed vector still retrieved: ${hits.toSeq}")
  }

  test("search touches only probed cells (candidate count bounded)") {
    NativeCosine.register(spark)
    val e = table("embeddings").select("vec_id", "embedding")
    val probes = e.filter(col("vec_id") < 5)
    val out = IvfIndex.topK(e, probes, "vec_id", "embedding", model,
      k = 3, nProbe = 2)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "IVF search degenerated to all-pairs")
    val rows = out.collect()
    rows.groupBy(_.getAs[Long]("probe_id")).foreach { case (_, rs) =>
      assert(rs.length <= 3)
    }
  }
}

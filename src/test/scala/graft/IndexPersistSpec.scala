package graft

import java.nio.file.Files

import graft.functions.{CosineLsh, SimHash}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-11: the last two sketch families gain persisted, appendable
  * indexes (SimHash signatures/block keys, CosineLsh band keys) under
  * the same contract as MinHashDedup.appendIndex / RetrievalIndex.
  * appendDocs / IvfIndex.appendVectors: the model constants are fixed at
  * build time and every stored row is per-doc, so append ≡ rebuild
  * row-for-row; probes against the stored relation find planted
  * neighbors. */
class IndexPersistSpec extends SparkSpec {

  import spark.implicits._

  private def assertSameRelation(a: DataFrame, b: DataFrame,
                                 what: String): Unit =
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      s"$what: stored and rebuilt relations differ")

  test("SimHash index: append ≡ rebuild, probe finds a planted twin") {
    val docs = table("documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val base = docs.filter(col("doc_id") % 5 =!= 4)
    val delta = docs.filter(col("doc_id") % 5 === 4)
    val dir = Files.createTempDirectory("graft-sim-idx").toString
    SimHash.writeIndex(
      SimHash.buildIndex(base, "doc_id", "toks", d = 3, nBlocks = 4), dir)
    SimHash.appendIndex(dir, delta, "doc_id", "toks")
    val stored = SimHash.readIndex(spark, dir)
    assert(stored.d == 3 && stored.nBlocks == 4)
    assertSameRelation(stored.keys,
      SimHash.buildIndex(docs, "doc_id", "toks", d = 3, nBlocks = 4).keys,
      "simhash keys")
    // planted twin: an arrival with doc 0's exact text must hit at dist 0
    val seed = table("documents").select("doc_id", "text")
      .orderBy("doc_id").limit(1).collect().head
    val arrival = Seq((1000000L, seed.getString(1)))
      .toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val hits = SimHash.pairsAgainstIndex(stored, arrival, "doc_id", "toks")
      .select("p_id", "idx_id", "dist").distinct()
      .as[(Long, Long, Int)].collect().toSet
    assert(hits.contains((1000000L, seed.getLong(0), 0)),
      s"planted twin not found: $hits")
  }

  test("CosineLsh index: append ≡ rebuild, probe finds the planted vector") {
    val vecs = table("embeddings")
    val base = vecs.filter(col("vec_id") % 5 =!= 4)
    val delta = vecs.filter(col("vec_id") % 5 === 4)
    val dir = Files.createTempDirectory("graft-lsh-idx").toString
    CosineLsh.writeIndex(
      CosineLsh.buildIndex(base, "vec_id", "embedding"), dir)
    CosineLsh.appendIndex(dir, delta, "vec_id", "embedding")
    val stored = CosineLsh.readIndex(spark, dir)
    assert(stored.nPlanes == 4 && stored.seed == 42L &&
      stored.dim == CosineLsh.DefaultDim && stored.bands == 1)
    assertSameRelation(stored.keys,
      CosineLsh.buildIndex(vecs, "vec_id", "embedding").keys,
      "cosine-lsh keys")
    // planted twin: re-probe with a stored vector under a new id — the
    // identical vector shares its bucket by construction, cosine = 1
    val seed = vecs.orderBy("vec_id").limit(1)
      .select(col("vec_id"), col("embedding")).collect().head
    val arrival = Seq((1000000L, seed.getSeq[Float](1)))
      .toDF("vec_id", "embedding")
    val hits = CosineLsh
      .probeIndex(stored, arrival, "vec_id", "embedding", threshold = 0.999)
      .groupBy("probe_id", "vec_id").agg(max("cos").as("cos"))
      .as[(Long, Long, Double)].collect()
    assert(hits.exists(h => h._1 == 1000000L && h._2 == seed.getLong(0)
        && h._3 >= 0.999),
      s"planted vector not found: ${hits.toSeq}")
  }

  test("compactIndex: takedown ≡ rebuild-without for all three index families") {
    // round-12: delete support across every sketch family — removing
    // ids from a per-doc-row index must equal an index never built
    // from them (rows are per-id, so the proof is relation equality)
    val rmPred = IncrementContract.isRemoved(col("doc_id"))

    val docs = table("documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val sDir = Files.createTempDirectory("graft-sim-cmp").toString
    SimHash.writeIndex(
      SimHash.buildIndex(docs, "doc_id", "toks", d = 3, nBlocks = 4), sDir)
    SimHash.compactIndex(sDir, docs.filter(rmPred).select("doc_id"))
    assertSameRelation(SimHash.readIndex(spark, sDir).keys,
      SimHash.buildIndex(docs.filter(!rmPred), "doc_id", "toks",
        d = 3, nBlocks = 4).keys, "simhash compact")

    val vecs = table("embeddings")
    val vRm = IncrementContract.isRemoved(col("vec_id"))
    val lDir = Files.createTempDirectory("graft-lsh-cmp").toString
    CosineLsh.writeIndex(
      CosineLsh.buildIndex(vecs, "vec_id", "embedding"), lDir)
    CosineLsh.compactIndex(lDir, vecs.filter(vRm).select("vec_id"))
    assertSameRelation(CosineLsh.readIndex(spark, lDir).keys,
      CosineLsh.buildIndex(vecs.filter(!vRm), "vec_id", "embedding").keys,
      "cosine-lsh compact")

    val texts = table("documents").select("doc_id", "text")
    val mDir = Files.createTempDirectory("graft-mh-cmp").toString
    graft.functions.MinHashDedup.writeIndex(
      graft.functions.MinHashDedup.buildIndex(texts, "doc_id", "text"),
      mDir)
    graft.functions.MinHashDedup.compactIndex(mDir,
      texts.filter(rmPred).select("doc_id"))
    val compacted = graft.functions.MinHashDedup.readIndex(spark, mDir)
    val rebuilt = graft.functions.MinHashDedup.buildIndex(
      texts.filter(!rmPred), "doc_id", "text")
    assertSameRelation(compacted.keys, rebuilt.keys, "minhash keys")
    assertSameRelation(compacted.shingles, rebuilt.shingles,
      "minhash shingles")
  }
}

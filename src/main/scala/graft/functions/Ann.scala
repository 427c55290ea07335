package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ONE entry point for the similarity family (round-8 verdict task #1):
  * the engine carries three ANN legs with measured ≥0.95-recall
  * configurations (SCALE.md ANN ladder) — [[CosineLsh]] (recall via
  * banded bucketing), [[IvfIndex]] (scan pruning via cells, in-memory or
  * on-disk), [[ProductQuantizer]] (scan-byte compression, IVF-PQ on-disk
  * index) — plus the exact brute-force scan. A user should not need to
  * know three libraries and their knobs; this router encodes the
  * measurements as defaults and picks the leg from what it can observe:
  * corpus count and an on-disk-index probe. Every underlying API stays
  * public for explicit control.
  *
  * Routing (see [[routeTopK]] / [[routePairs]] — pure given the probe
  * result, so specs assert them directly):
  *   - top-k with an index directory → the index's own search path
  *     (`pq_model` present → IVF-PQ codes index; `ivf_model` alone →
  *     IVF cells index) — probed cells are the only bytes scanned;
  *   - top-k, corpus ≤ [[BruteTopKMax]] → exact brute scan (measured at
  *     parity with IVF up to 20k vectors — below that an index buys
  *     nothing and costs recall);
  *   - top-k, larger → IVF with [[DefaultNProbe]] = 6 (recall@10 0.96)
  *     over [[cellsFor]]-sized cells (~[[CellTarget]] vectors/cell, the
  *     measured 16-cells-at-20k operating point);
  *   - near-dup pairs, corpus ≤ [[BrutePairsMax]] → exact all-pairs
  *     (quadratic, affordable only at fixture scale);
  *   - near-dup pairs, larger → banded LSH with `planesForCount`-sized
  *     planes, depth 1, bands 2 (pair recall 0.963) — or bands 3
  *     (0.992) when `highRecall` is set.
  *
  * Output contracts match the underlying legs: topK → (probe_id, rn,
  * vec_id, cos) exact cosines; nearDupPairs → (a_id, b_id, cos ≥
  * threshold). At 100 TB the expected call is `topK(..., indexPath =
  * Some(path))` against a [[ProductQuantizer.writeIndex]] directory —
  * the other routes are the build-time and small-corpus paths. */
object Ann {

  sealed abstract class Route(val name: String) {
    override def toString: String = name
  }
  case object BruteRoute extends Route("brute")
  case object LshPairsRoute extends Route("lsh-pairs")
  case object IvfRoute extends Route("ivf")
  case object IndexedIvfRoute extends Route("indexed-ivf")
  case object IndexedPqRoute extends Route("indexed-pq")

  /** Brute top-k is at measured parity with IVF up to here (SCALE.md:
    * 20k vectors, brute 0.77 s vs IVF-np6 0.77 s, recall 1 vs 0.96). */
  val BruteTopKMax: Long = 20000L
  /** All-pairs is quadratic; past a few thousand vectors the LSH path
    * wins even at fixture scale (20k: exact 7.3 s vs p5-b1 7.9 s, and
    * the gap inverts as n²/bucketed diverge). */
  val BrutePairsMax: Long = 4000L
  /** Banding is the measured recall lever (independent misses multiply):
    * bands 2 → pair recall 0.963, bands 3 → 0.992. */
  val DefaultBands = 2
  val HighRecallBands = 3
  /** Bit-flip probe radius 1 — depth 2 measured DOMINATED by banding
    * (correlated misses within one plane set). */
  val DefaultProbeDepth = 1
  /** IVF probe width: recall@10 0.96 at brute-parity cost. */
  val DefaultNProbe = 6
  /** ADC survivors re-ranked exactly per probe (5 × k at k = 10 measured
    * recall 0.98). */
  val DefaultRerankPerK = 5
  /** Target vectors per IVF cell — 16 cells at the 20k measurement. */
  val CellTarget = 1250L

  /** IVF cell count for a corpus: ~[[CellTarget]] vectors/cell, at least
    * 4 cells, capped so the per-probe centroid scoring (k HOF folds)
    * stays trivial next to the scan it prunes. */
  def cellsFor(corpusCount: Long): Int =
    math.max(4L, math.min(4096L, corpusCount / CellTarget)).toInt

  private def pathExists(spark: SparkSession, p: String): Boolean = {
    val hp = new org.apache.hadoop.fs.Path(p)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(hp)
  }

  /** Model sidecars are tiny but cost a driver parquet job per open —
    * per-call loading measured ~0.9 s of the indexed route's latency.
    * Cache them keyed by (path, directory mtime): a re-written index
    * bumps the mtime, so staleness self-invalidates without an explicit
    * eviction API. */
  private val modelCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), AnyRef]()

  private def cached[A <: AnyRef](spark: SparkSession, dir: String)
                                 (load: => A): A = {
    val hp = new org.apache.hadoop.fs.Path(dir)
    val mtime = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .getFileStatus(hp).getModificationTime
    // evict superseded snapshots of the same dir: the mtime key means a
    // stale entry can never be READ again, so keeping it is a pure leak
    // for a session that rewrites its indexes (self-review finding)
    modelCache.keySet.removeIf(k => k._1 == dir && k._2 != mtime)
    modelCache.computeIfAbsent((dir, mtime), _ => load).asInstanceOf[A]
  }

  private def pqModels(spark: SparkSession, path: String)
      : (ProductQuantizer.Model, IvfIndex.Model) =
    (cached(spark, s"$path/pq_model")(ProductQuantizer.loadModel(spark, path)),
      cached(spark, s"$path/ivf_model")(IvfIndex.loadModel(spark, path)))

  /** The top-k route for (corpus count, optional index directory) — the
    * index probe looks for the model sidecars (`pq_model` / `ivf_model`)
    * that [[ProductQuantizer.writeIndex]] / [[IvfIndex.writeIndex]]
    * leave next to their data tables. */
  def routeTopK(spark: SparkSession, corpusCount: Long,
                indexPath: Option[String]): Route =
    indexPath match {
      case Some(p) if pathExists(spark, s"$p/pq_model") => IndexedPqRoute
      case Some(p) if pathExists(spark, s"$p/ivf_model") => IndexedIvfRoute
      case Some(p) => throw new IllegalArgumentException(
        s"$p is not a graft ANN index (no pq_model or ivf_model sidecar)")
      case None if corpusCount <= BruteTopKMax => BruteRoute
      case None => IvfRoute
    }

  /** The near-dup-pairs route for a corpus count. */
  def routePairs(corpusCount: Long): Route =
    if (corpusCount <= BrutePairsMax) BruteRoute else LshPairsRoute

  /** Auto-routed approximate top-k by cosine. Output (probe_id, rn,
    * vec_id, cos); similarities are exact on every route (approximate
    * legs re-rank or verify with the native cosine). `corpusCount` skips
    * the count() job when the caller already knows it (table stats — an
    * over-estimate only shifts the brute/IVF boundary, never correctness).
    * NOTE: the in-memory IVF route trains on the corpus at call time —
    * at 100 TB build the index ONCE ([[ProductQuantizer.writeIndex]])
    * and pass `indexPath`. */
  def topK(corpus: DataFrame, probes: DataFrame, idCol: String,
           vecCol: String, k: Int, corpusCount: Option[Long] = None,
           indexPath: Option[String] = None, nProbe: Int = DefaultNProbe,
           seed: Long = 42L): DataFrame = {
    val spark = corpus.sparkSession
    lazy val n = corpusCount.getOrElse(corpus.count())
    val route =
      if (indexPath.isDefined) routeTopK(spark, 0L, indexPath)
      else routeTopK(spark, n, None)
    route match {
      case IndexedPqRoute =>
        val (pq, ivf) = pqModels(spark, indexPath.get)
        ProductQuantizer.topKIndexed(spark, indexPath.get, corpus, probes,
          idCol, vecCol, pq, ivf, k, nProbe, rerank = DefaultRerankPerK * k)
      case IndexedIvfRoute => IvfIndex.topKIndexed(spark, indexPath.get,
        probes, idCol, vecCol,
        cached(spark, s"${indexPath.get}/ivf_model")(
          IvfIndex.loadModel(spark, indexPath.get)), k, nProbe)
      case BruteRoute => bruteTopK(corpus, probes, idCol, vecCol, k)
      case IvfRoute =>
        val cells = cellsFor(n)
        // train's centroid count is capped by its driver sample — size
        // the sample to >= 8 vectors/cell (bounded: <= 32k rows at the
        // 4096-cell cap) or large corpora would silently get fewer,
        // fatter cells than the CellTarget contract (self-review finding)
        val model = IvfIndex.train(corpus, vecCol, cells, seed,
          sampleN = math.max(1000, cells * 8))
        IvfIndex.topK(corpus, probes, idCol, vecCol, model, k,
          nProbe = math.min(nProbe, cells))
      case r => throw new IllegalStateException(s"topK cannot route to $r")
    }
  }

  /** Auto-routed near-duplicate pairs: (a_id, b_id, cos) with a_id <
    * b_id and cos ≥ threshold. `dim` must match the data (the LSH
    * hyperplanes are literals of that width). `highRecall` trades 2×
    * cost for the 0.992-recall banding. */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                   threshold: Double, dim: Int = CosineLsh.DefaultDim,
                   corpusCount: Option[Long] = None,
                   highRecall: Boolean = false,
                   seed: Long = 42L): DataFrame = {
    val n = corpusCount.getOrElse(df.count())
    routePairs(n) match {
      case BruteRoute => brutePairs(df, idCol, vecCol, threshold)
      case _ =>
        val d =
          if (dim > 0) dim
          else df.select(size(col(vecCol)).as("__d"))
            .filter(col("__d") > 0).head(1).headOption
            .map(_.getInt(0)).getOrElse(CosineLsh.DefaultDim)
        val bands = if (highRecall) HighRecallBands else DefaultBands
        // plane sizing deliberately IGNORES the depth-1 fan-out: the
        // measured 0.963/0.992 configs are p5 = planesForCount(n) at
        // depth 1 — coarser buckets are what buy borderline-pair recall,
        // and the hot-bucket cap already bounds the occupancy tail.
        // (Sizing WITH the fan-out, as depth-2 callers must, measured
        // recall 0.81 at threshold 0.4 — the round-8 router bug.)
        CosineLsh.nearDuplicatePairs(df, idCol, vecCol, threshold,
          nPlanes = CosineLsh.planesForCount(n),
          seed = seed, dim = d, bands = bands,
          probeDepth = DefaultProbeDepth)
    }
  }

  /** The exact cosine column — [[CosineLsh]]'s element-type dispatch
    * (ONE implementation: float/double arrays verify in their own
    * precision, other numeric elements widen to double). */
  private def cosineOf(df: DataFrame, vecCol: String, a: Column,
                       b: Column): Column =
    CosineLsh.cosine(df.sparkSession, a, b,
      CosineLsh.elemType(df, vecCol))

  /** Exact top-k: corpus streamed once, probes broadcast, per-probe
    * window — the right baseline below [[BruteTopKMax]] and the recall
    * ground truth above it. */
  def bruteTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
                vecCol: String, k: Int): DataFrame = {
    val c = Materialize.spread(
      corpus.select(col(idCol).as("vec_id"), col(vecCol).as("cv")))
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("pv"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cos").desc, col("vec_id").asc)
    c.crossJoin(broadcast(p))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        cosineOf(corpus, vecCol, col("cv"), col("pv")).as("cos"))
      .filter(col("cos").isNotNull)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("probe_id"), col("rn"), col("vec_id"), col("cos"))
  }

  /** Exact all-pairs at threshold — quadratic; [[routePairs]] only sends
    * corpora ≤ [[BrutePairsMax]] here. */
  def brutePairs(df: DataFrame, idCol: String, vecCol: String,
                 threshold: Double): DataFrame = {
    val a = Materialize.spread(
      df.select(col(idCol).as("a_id"), col(vecCol).as("va")))
    val b = df.select(col(idCol).as("b_id"), col(vecCol).as("vb"))
    val cos = cosineOf(df, vecCol, col("va"), col("vb"))
    a.join(broadcast(b), col("a_id") < col("b_id") && cos >= threshold)
      .select(col("a_id"), col("b_id"), cos.as("cos"))
  }
}

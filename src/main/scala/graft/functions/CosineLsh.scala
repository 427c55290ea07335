package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.util.Random

/** Random-hyperplane LSH for approximate nearest-neighbor search over an
  * embedding column (SURVEY.md §2.3 J — the scale path for q_knn_join;
  * brute-force cosine in SimilarityQueries is the correctness baseline).
  *
  * sign-LSH: bucket = bitmask of sign(v · h_i) over nPlanes fixed random
  * hyperplanes (seeded, so bucketing is deterministic and reproducible
  * across runs/executors). P[two vectors agree on one plane] =
  * 1 − θ/π, so cosine-close vectors collide with high probability.
  *
  * At 100 TB: bucketize is a per-row codegen'd expression (hyperplanes are
  * literals broadcast with the plan); the candidate join is key-equality
  * on bucket — shuffle ∝ corpus size, bucket fan-out 1 (or 1+nPlanes with
  * multiProbe, flipping one bit per probe key to trade shuffle volume for
  * recall). Never an all-pairs cross join.
  */
object CosineLsh {

  /** Embedding dimensionality of the engine's fixture contract. ArrayType
    * schemas don't carry a length, so callers with other corpora must pass
    * `dim` explicitly — a driver-side `head()` probe per call (the old
    * behavior) is a full Spark job just to learn a constant, and an
    * engine-path driver action besides. dim MUST match the data: zip_with
    * pads a length mismatch with NULLs, which nulls the whole dot-product
    * fold and collapses every row into one degenerate bucket. */
  val DefaultDim = 64

  /** Default per-bucket vector cap for [[nearDuplicatePairs]] — same role
    * (and same chain-or-drop semantics) as MinHashDedup.DefaultMaxBucket:
    * a bucket of c vectors is c²/2 cosine verifications, the quadratic
    * hazard of the pipeline. */
  val DefaultMaxBucket: Int = 4096

  /** Size nPlanes from the corpus: the smallest plane count (≥ 2) whose
    * uniform-hash expected bucket size, count / 2^nPlanes, is at or under
    * `targetBucketSize` — per-bucket candidate volume then stays
    * ~targetBucketSize × corpus instead of corpus²/16 at the old fixed
    * default. Capped at 24 planes (16M buckets — enough for any corpus
    * whose per-bucket work matters; beyond it the multi-probe fan-out,
    * 1 + nPlanes keys/vector, dominates). Sign-LSH bucket occupancy is
    * NOT uniform on real embedding corpora (correlated dimensions fill
    * some cells far past the expectation), which is why the cap in
    * [[nearDuplicatePairs]] exists alongside this sizing — size for the
    * expectation, cap the outliers, watch [[bucketStats]]. */
  def planesForCount(count: Long, targetBucketSize: Long = 1024L,
                     probeDepth: Int = 0): Int = {
    require(count >= 0, s"negative corpus count $count")
    require(targetBucketSize > 0, s"bad targetBucketSize $targetBucketSize")
    var n = 2
    while (n < 24 && (count >> n) >
        math.max(1L, targetBucketSize / keysPerVector(n, probeDepth))) n += 1
    n
  }

  /** Candidate keys one vector emits at a probe depth — the fan-out that
    * multiplies effective bucket occupancy. Sizing MUST account for it:
    * at nPlanes = 5 / depth = 2 every vector lands in 16 of the 32
    * buckets, so every bucket blows past the hot cap, the whole corpus
    * degrades to chain edges, and recall collapses (measured 0.0003 —
    * AnnBench round 7). planesForCount(count, target, probeDepth) divides
    * the target by this fan-out; probeDepth = 0 is the legacy
    * occupancy-blind sizing (single-key corpus sides, e.g. [[topK]]'s
    * corpus relation). */
  def keysPerVector(nPlanes: Int, depth: Int): Int = {
    require(depth >= 0 && depth <= 2, s"probe depth must be 0, 1 or 2, got $depth")
    1 + (if (depth >= 1) nPlanes else 0) +
      (if (depth >= 2) nPlanes * (nPlanes - 1) / 2 else 0)
  }

  /** Per-bucket vector counts of the (multi-probed) keyed relation — the
    * monitoring relation for the hot-bucket cap, mirroring
    * MinHashDedup.hotBuckets: buckets with n_vecs > maxBucket are chained
    * or dropped by [[nearDuplicatePairs]]; inspect them here so the
    * truncation is visible, never silent. */
  def bucketStats(df: DataFrame, vecCol: String, nPlanes: Int = 4,
                  seed: Long = 42L, dim: Int = DefaultDim,
                  maxBucket: Int = DefaultMaxBucket,
                  bands: Int = 1, probeDepth: Int = 1): DataFrame = {
    val allPlanes = bandPlanes(dim, nPlanes, seed, bands)
    df.select(explode(bandedKeys(col(vecCol), allPlanes, probeDepth)).as("bkt"))
      .groupBy("bkt").agg(count(lit(1)).as("n_vecs"))
      .filter(col("n_vecs") > maxBucket)
  }

  // stream-side parallelism floor for the candidate joins — see
  // Materialize.spread for the one-partition-corpus failure mode
  private def spread(df: DataFrame): DataFrame = Materialize.spread(df)

  /** dot(vec, literal hyperplane) as a HOF fold — [[bucketHof]] only. */
  private def dotLit(vec: Column, plane: Array[Double]): Column =
    aggregate(
      zip_with(vec, typedlit(plane.toSeq), (x, y) => x.cast("double") * y),
      lit(0d), (acc, v) => acc + v)

  /** Deterministic random hyperplanes: nPlanes × dim gaussians. */
  def planes(dim: Int, nPlanes: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Bucket id (0 until 2^nPlanes) for an embedding column — the native
    * codegen kernel ([[LshBucket]]): one compiled nPlanes × dim loop per
    * row. The HOF formulation it replaced re-ran interpreted per probe
    * key — see the LshBucket scaladoc for the measured collapse. */
  def bucket(vec: Column, planes: Array[Array[Double]]): Column =
    org.apache.spark.sql.graftbridge.PlanBridge.column(
      LshBucket(org.apache.spark.sql.graftbridge.PlanBridge.expression(vec), planes))

  /** The original HOF bucket (sum of when(dotLit > 0, 1 << i)) — kept as
    * the independent bit-identity mirror for the spec. NOT a production
    * path (CodegenFallback, interpreted per element). Degenerate inputs
    * differ deliberately: the HOF collapses null vectors and dim
    * mismatches to bucket 0; the native kernel surfaces them as NULL. */
  private[graft] def bucketHof(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dotLit(vec, p) > 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Bucket + bit-flip neighbor buckets (multi-probe): vectors near a
    * hyperplane boundary are still found. `depth` is the probe radius —
    * 1 flips each single bit (1 + n keys), 2 adds every two-bit flip
    * (1 + n + C(n,2) keys: a pair split by TWO near-boundary planes still
    * collides — the recall knob the round-6 verdict asked to expose).
    * Key fan-out is the cost: shuffle volume scales with the key count,
    * so depth 2 belongs with [[planesForCount]]-sized plane counts where
    * C(n,2) stays modest (n = 5 → 16 keys/vector). */
  def multiProbeBuckets(vec: Column, planes: Array[Array[Double]],
                        depth: Int = 1): Column = {
    require(depth >= 0 && depth <= 2, s"probe depth must be 0, 1 or 2, got $depth")
    val b = bucket(vec, planes)
    val n = planes.length
    val one =
      if (depth >= 1) (0 until n).map(i => b.bitwiseXOR(lit(1 << i)))
      else Seq.empty
    val two =
      if (depth >= 2)
        for { i <- 0 until n; j <- (i + 1) until n }
          yield b.bitwiseXOR(lit((1 << i) | (1 << j)))
      else Seq.empty
    array((b +: one) ++ two: _*)
  }

  /** The (multi-probed, band-tagged) candidate keys of one vector across
    * `bands` independent plane sets — a pair collides if it shares a
    * bucket in ANY band, so pair recall is 1 − (1 − m^p)^bands for
    * per-plane agreement m: the second recall knob, orthogonal to probe
    * depth. Band id rides bits 32+ of the key (bucket ids stay below
    * 2^24 by the planesForCount cap). */
  private def bandedKeys(vec: Column, allPlanes: Seq[Array[Array[Double]]],
                         depth: Int): Column = {
    val perBand = allPlanes.zipWithIndex.map { case (ps, bd) =>
      transform(multiProbeBuckets(vec, ps, depth),
        k => k.bitwiseOR(lit(bd.toLong << 32)))
    }
    if (perBand.length == 1) perBand.head else flatten(array(perBand: _*))
  }

  /** Deterministic per-band plane sets (band b reseeds with seed + b). */
  private def bandPlanes(dim: Int, nPlanes: Int, seed: Long,
                         bands: Int): Seq[Array[Array[Double]]] = {
    require(bands >= 1, s"bands must be >= 1, got $bands")
    (0 until bands).map(b => planes(dim, nPlanes, seed + b))
  }

  /** Codegen'd verify cosine (NativeCosine). The HOF formulation
    * (aggregate over zip_with) is bit-identical but a HigherOrderFunction
    * is CodegenFallback — interpreted per element — and the verify step
    * evaluates one cosine PER CANDIDATE PAIR, the hottest loop of the
    * whole LSH plan: measured ~two orders of magnitude slower on a few
    * million candidates. Registration is idempotent per session.
    *
    * The native kernel reads ARRAY<FLOAT> and ARRAY<DOUBLE> in their own
    * precision, so float and double corpora both verify exactly; any other
    * numeric element type is widened to double (exact for int/long ≤ 2^53,
    * the embedding-id regime). `elem` is the corpus column's element type
    * from the caller's schema — Columns carry no type pre-analysis. */
  private[graft] def cosine(spark: org.apache.spark.sql.SparkSession,
                            a: Column, b: Column,
                            elem: org.apache.spark.sql.types.DataType): Column = {
    import org.apache.spark.sql.types.{DoubleType, FloatType}
    NativeCosine.register(spark)
    elem match {
      case FloatType | DoubleType => call_function(NativeCosine.name, a, b)
      case _ => call_function(NativeCosine.name,
        a.cast("array<double>"), b.cast("array<double>"))
    }
  }

  /** Element type of `df.vecCol`, for the [[cosine]] dispatch. */
  private[graft] def elemType(df: DataFrame, vecCol: String)
      : org.apache.spark.sql.types.DataType =
    df.schema(vecCol).dataType match {
      case org.apache.spark.sql.types.ArrayType(et, _) => et
      case dt => throw new IllegalArgumentException(
        s"$vecCol must be an array column, got ${dt.sql}")
    }

  /** [[cosine]] for a pair whose two sides may carry DIFFERENT array
    * element types (round-11 advice: an index built from float vectors
    * probed with doubles fed mismatched arrays into the native kernel).
    * Matching types dispatch as before; a mismatch widens BOTH sides to
    * array<double> — exact for float→double and for integer ids ≤ 2^53,
    * the embedding regime. */
  private[graft] def cosineMixed(spark: org.apache.spark.sql.SparkSession,
                                 a: Column, b: Column,
                                 ea: org.apache.spark.sql.types.DataType,
                                 eb: org.apache.spark.sql.types.DataType)
      : Column =
    if (ea == eb) cosine(spark, a, b, ea)
    else cosine(spark, a.cast("array<double>"), b.cast("array<double>"),
      org.apache.spark.sql.types.DoubleType)

  /** Embedding-cosine near-duplicate pairs (north-star dedup family):
    * all (a,b) with cosine >= threshold, found ONLY inside shared LSH
    * buckets — the all-pairs comparison never materializes. One-bit-flip
    * multi-probing keeps recall for pairs split by a hyperplane.
    *
    * Hot-bucket cap (same semantics as MinHashDedup.candidatePairs): a
    * bucket over `maxBucket` vectors contributes its sorted id-chain of
    * c−1 candidate edges instead of the c²/2 clique
    * (`chainHotBuckets=true`, default — identical-vector mega-clusters,
    * the dominant cause, verify at cosine 1 along the whole chain, so
    * connected-component dedup still collapses them) or is dropped
    * (`false`). [[bucketStats]] is the monitoring relation; size nPlanes
    * with [[planesForCount]] so the cap only bites outliers. */
  def nearDuplicatePairs(df: DataFrame, idCol: String, vecCol: String,
                         threshold: Double, nPlanes: Int = 4,
                         seed: Long = 42L, dim: Int = DefaultDim,
                         maxBucket: Int = DefaultMaxBucket,
                         chainHotBuckets: Boolean = true,
                         bands: Int = 1, probeDepth: Int = 1): DataFrame = {
    require(maxBucket >= 2, s"maxBucket must allow at least a pair, got $maxBucket")
    val et = elemType(df, vecCol)
    val allPlanes = bandPlanes(dim, nPlanes, seed, bands)
    // three consumers (bucket counts + both self-join sides)
    val keyed = Materialize(spread(
      df.select(col(idCol).as("nd_id"), col(vecCol).as("nd_v"),
        explode(bandedKeys(col(vecCol), allPlanes, probeDepth)).as("bkt"))))
    // over-cap bucket keys are ≤ (1+nPlanes)·corpus/maxBucket by
    // construction — broadcastable, so the cap never reshuffles `keyed`
    val hot = keyed.groupBy("bkt").agg(count(lit(1)).as("n_vecs"))
      .filter(col("n_vecs") > maxBucket).select("bkt")
    val kept = keyed.join(broadcast(hot), Seq("bkt"), "left_anti")
    val a = kept.alias("a")
    val b = kept.alias("b")
    val clique = a.join(b,
        col("a.bkt") === col("b.bkt") && col("a.nd_id") < col("b.nd_id"))
      .select(col("a.nd_id").as("a_id"), col("b.nd_id").as("b_id"),
        cosine(df.sparkSession, col("a.nd_v"), col("b.nd_v"), et).as("cos"))
    val cands =
      if (!chainHotBuckets) clique
      else {
        val w = Window.partitionBy("bkt").orderBy("nd_id")
        val chains = keyed.join(broadcast(hot), Seq("bkt"), "left_semi")
          .withColumn("nxt_id", lead("nd_id", 1).over(w))
          .withColumn("nxt_v", lead("nd_v", 1).over(w))
          .filter(col("nxt_id").isNotNull)
          .select(col("nd_id").as("a_id"), col("nxt_id").as("b_id"),
            cosine(df.sparkSession, col("nd_v"), col("nxt_v"), et).as("cos"))
        clique.unionAll(chains)
      }
    cands
      .filter(col("cos") >= threshold)
      .groupBy("a_id", "b_id").agg(max("cos").as("cos")) // dedup multi-probe hits
  }

  /** The persisted sign-LSH index (round-10 verdict task #4 — the last
    * sketch family without a stored/appendable artifact, with SimHash):
    * `keys` = (ls_id, ls_v, bkt) — one plain bucket key per band per
    * vector (the depth-0 corpus-side convention of [[topK]]: only PROBES
    * fan out with multi-probe depth, so index size stays `bands` rows
    * per vector). The hyperplanes are a pure function of
    * (dim, nPlanes, seed, bands), recorded in meta/ at build time — the
    * fixed-model contract: appending a disjoint-id batch re-derives its
    * keys under the SAME planes, so append ≡ rebuild row-for-row
    * (IndexPersistSpec pins it). Re-sizing nPlanes for a grown corpus is
    * a rebuild decision ([[planesForCount]]), like an IVF re-train.
    * At 100 TB the key table is stored bucketed by bkt. */
  final case class StoredIndex(keys: DataFrame, dim: Int, nPlanes: Int,
                               seed: Long, bands: Int)

  /** Build the [[StoredIndex]] key relation of a corpus in one pass. */
  def buildIndex(df: DataFrame, idCol: String, vecCol: String,
                 nPlanes: Int = 4, seed: Long = 42L, dim: Int = DefaultDim,
                 bands: Int = 1): StoredIndex = {
    val allPlanes = bandPlanes(dim, nPlanes, seed, bands)
    StoredIndex(
      df.select(col(idCol).as("ls_id"), col(vecCol).as("ls_v"),
        explode(bandedKeys(col(vecCol), allPlanes, depth = 0)).as("bkt")),
      dim, nPlanes, seed, bands)
  }

  /** Persist a [[StoredIndex]] under `path` (keys/ + 1-row meta/). */
  def writeIndex(index: StoredIndex, path: String): Unit = {
    index.keys.write.mode("overwrite").parquet(s"$path/keys")
    val spark = index.keys.sparkSession
    import spark.implicits._
    Seq((index.dim, index.nPlanes, index.seed, index.bands))
      .toDF("dim", "n_planes", "seed", "bands")
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Re-open a persisted index (plane constants from meta/, so probes
    * and appends cannot fork the hyperplanes the index was built with). */
  def readIndex(spark: org.apache.spark.sql.SparkSession,
                path: String): StoredIndex = {
    val m = spark.read.parquet(s"$path/meta").head()
    StoredIndex(spark.read.parquet(s"$path/keys"),
      m.getInt(0), m.getInt(1), m.getLong(2), m.getInt(3))
  }

  /** Append a batch of NEW vectors (disjoint ids) to a stored index:
    * one bucketing pass over the batch under the stored planes,
    * committed through the staged-rename primitive (crash-atomic; loud
    * on a never-built index). The standing corpus is never read. */
  def appendIndex(path: String, batch: DataFrame, idCol: String,
                  vecCol: String): Unit = {
    val idx = readIndex(batch.sparkSession, path)
    StagedCommit.commitAppend(s"$path/keys",
      buildIndex(batch, idCol, vecCol, idx.nPlanes, idx.seed, idx.dim,
        idx.bands).keys)
  }

  /** DELETE compaction of a stored index: drop every bucket-key row of
    * `removeIds` vectors (per-id rows, so deletion is exact — probes
    * simply stop seeing them). An updated vector composes compactIndex
    * + appendIndex. */
  def compactIndex(path: String, removeIds: DataFrame): Unit =
    FsUtil.withWriterLock(path) {
      CompactStore.compactRelation(s"$path/keys", "ls_id",
        removeIds.select(col(removeIds.columns.head).as("ls_id")), None)
    }

  /** Arriving vectors probed against a stored index — batch or
    * STREAMING (stateless stream-static equi-join on bucket key):
    * (probe_id, vec_id, cos) hits with cosine ≥ threshold. Probes
    * multi-probe at `probeDepth` for recall; a pair colliding in
    * several probe keys emits once per key (the againstIndex
    * multiplicity convention — batch callers groupBy max). */
  def probeIndex(index: StoredIndex, probes: DataFrame, idCol: String,
                 vecCol: String, threshold: Double,
                 probeDepth: Int = 1): DataFrame = {
    // the stored side's element type comes from the index, not the probe
    // side — a float-built index probed with doubles (or vice versa)
    // widens both to double instead of feeding the native kernel
    // mismatched array types (round-11 advice)
    val etP = elemType(probes, vecCol)
    val etS = elemType(index.keys, "ls_v")
    val allPlanes = bandPlanes(index.dim, index.nPlanes, index.seed,
      index.bands)
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("pv"),
      explode(bandedKeys(col(vecCol), allPlanes, probeDepth)).as("bkt"))
    p.join(index.keys, Seq("bkt"))
      .filter(col("ls_id") =!= col("probe_id"))
      .select(col("probe_id"), col("ls_id").as("vec_id"),
        cosineMixed(probes.sparkSession, col("pv"), col("ls_v"), etP, etS)
          .as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Approximate top-k join: probes find neighbors only within their LSH
    * bucket (probes multi-probe adjacent buckets for recall; `bands`
    * plane sets are searched independently and merged — the corpus side
    * carries one plain bucket key per band, only probes fan out with
    * depth). Output: (probe_id, rn, vec_id, cos). */
  def topK(corpus: DataFrame, probes: DataFrame, idCol: String,
           vecCol: String, k: Int, nPlanes: Int = 4,
           seed: Long = 42L, dim: Int = DefaultDim,
           bands: Int = 1, probeDepth: Int = 1): DataFrame = {
    val etC = elemType(corpus, vecCol)
    val etP = elemType(probes, vecCol)
    val allPlanes = bandPlanes(dim, nPlanes, seed, bands)
    val c = spread(corpus.select(col(idCol).as("vec_id"), col(vecCol).as("cv"),
      explode(bandedKeys(col(vecCol), allPlanes, depth = 0)).as("bkt")))
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("pv"),
        explode(bandedKeys(col(vecCol), allPlanes, probeDepth)).as("bkt"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cos").desc, col("vec_id").asc)
    c.join(p, "bkt")
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        cosineMixed(corpus.sparkSession, col("cv"), col("pv"), etC, etP)
          .as("cos"))
      // multi-probe can reach the same candidate via two bucket keys
      .groupBy("probe_id", "vec_id").agg(max("cos").as("cos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("probe_id"), col("rn"), col("vec_id"), col("cos"))
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev utility: the similarity family's scale paths measured against their
  * exact baselines on one embeddings corpus —
  *   1. near-dup pairs: exact all-pairs (the q_embed_neardup shape) vs the
  *      LSH-bucketed candidate join (functions/CosineLsh), with pair
  *      recall — the number the "all-pairs is forbidden at 100 TB, LSH is
  *      the scale path" scaladocs point at;
  *   2. probe top-k: brute-force scan vs IVF nProbe search
  *      (functions/IvfIndex), with recall@k.
  * Usage: runMain graft.AnnBench [sfDir] [threshold] [reps]
  */
object AnnBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/graft-sf1"
    val threshold = if (args.length > 1) args(1).toDouble else 0.9
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    functions.NativeCosine.register(spark)

    val e = Tables.load(spark, sfDir, "embeddings")
    val n = e.count()
    val dim = e.select(size(col("embedding"))).head().getInt(0)

    def timeMedian(label: String)(run: () => Long): Long = {
      run() // warm
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val rows = run()
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      val med = times.map(_._1).sorted.apply(reps / 2)
      println(f"[annbench] $label%-14s median $med%.3f s  rows=${times.head._2}")
      times.head._2
    }

    // ---- 1. near-dup pairs at `threshold` ----
    // the codegen'd native expression — an interpreted HOF chain inside a
    // nested-loop condition is ~100x slower and would measure the
    // expression, not the plan
    def cosRaw(a: String, b: String) =
      call_function(functions.NativeCosine.name, col(a), col(b))

    def exactPairs: DataFrame = {
      val a = e.repartition(col("vec_id"))
        .select(col("vec_id").as("a_id"), col("embedding").as("ea"))
      val b = e.select(col("vec_id").as("b_id"), col("embedding").as("eb"))
      a.join(broadcast(b),
        // >= : the SAME comparator as CosineLsh.nearDuplicatePairs, so
        // the ground-truth pair universe matches the leg it grades
        col("a_id") < col("b_id") && cosRaw("ea", "eb") >= threshold)
        .select("a_id", "b_id")
    }
    def lshPairs(nPlanes: Int, bands: Int, depth: Int): DataFrame =
      functions.CosineLsh
        .nearDuplicatePairs(e, "vec_id", "embedding", threshold,
          nPlanes = nPlanes, dim = dim, bands = bands, probeDepth = depth)
        .select("a_id", "b_id")

    timeMedian("pairs-exact")(() => exactPairs.count())
    val exactSet = exactPairs.cache()
    val tot = exactSet.count()
    // recall/cost sweep over the knobs: plane count (bucket granularity),
    // band count (independent plane sets — misses multiply), probe depth
    // (bit-flip radius; depth 2 needs planesForCount's fan-out-aware
    // sizing or the keys flood the buckets — measured recall 0.0003 at
    // p5/d2 before the sizing fix)
    // depth-2 probing measured dominated by banding (p11-b1-d2: recall
    // 0.814 at 44.7 s vs p5-b2-d1: 0.963 at 20.4 s — one plane set's
    // 2-bit neighborhood is more correlated than a fresh band), so the
    // recorded sweep is the banding ladder; d2 stays available as a knob
    val p1 = functions.CosineLsh.planesForCount(n)
    for ((nPlanes, bands, depth) <- Seq((p1, 1, 1), (p1, 2, 1), (p1, 3, 1))) {
      val label = s"pairs-lsh-p$nPlanes-b$bands-d$depth"
      timeMedian(label)(() => lshPairs(nPlanes, bands, depth).count())
      val hit = lshPairs(nPlanes, bands, depth)
        .join(exactSet, Seq("a_id", "b_id"), "left_semi").count()
      println(f"[annbench] $label%-24s recall ${hit.toDouble / math.max(1, tot)}%.4f ($hit of $tot)")
    }
    exactSet.unpersist()

    // ---- 2. probe top-k: brute force vs IVF ----
    val k = 10
    val probes = e.filter(col("vec_id") < 20)
      .select(col("vec_id"), col("embedding"))
    def bruteTopK: DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("probe_id")
        .orderBy(col("cos").desc, col("vec_id").asc)
      e.crossJoin(broadcast(probes
          .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))))
        .filter(col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id"),
          cosRaw("embedding", "pv").as("cos"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k)
        .select("probe_id", "vec_id")
    }
    val model = functions.IvfIndex.train(e, "embedding", k = 16)
    def ivfTopK(nProbe: Int): DataFrame = functions.IvfIndex
      .topK(e, probes, "vec_id", "embedding", model, k, nProbe = nProbe)
      .select("probe_id", "vec_id")

    timeMedian("topk-brute")(() => bruteTopK.count())
    val bt = bruteTopK.cache()
    val itot = bt.count()
    for (nProbe <- Seq(2, 4, 6)) {
      timeMedian(s"topk-ivf-np$nProbe")(() => ivfTopK(nProbe).count())
      val ihit = ivfTopK(nProbe)
        .join(bt, Seq("probe_id", "vec_id"), "left_semi").count()
      println(f"[annbench] topk-ivf-np$nProbe recall@$k ${ihit.toDouble / math.max(1, itot)}%.4f ($ihit of $itot)")
    }
    // ---- 3. probe top-k: PQ compressed-domain ADC scan (+ exact re-rank)
    // and the IVF-PQ composition (cells prune WHICH rows, codes shrink
    // WHAT each row costs). On these near-isotropic gaussian fixtures PQ
    // needs a fine codebook (m=16/k=64 — a clustered production corpus
    // gets away with far coarser); the scan-byte cut vs float32 is 16×.
    val pq = functions.ProductQuantizer.train(e, "embedding", m = 16, k = 64)
    def pqTopK: DataFrame = functions.ProductQuantizer
      .topK(e, probes, "vec_id", "embedding", pq, k, rerank = 5 * k)
      .select("probe_id", "vec_id")
    def ivfPqTopK(nProbe: Int): DataFrame = functions.ProductQuantizer
      .topKIvf(e, probes, "vec_id", "embedding", pq, model, k,
        nProbe = nProbe, rerank = 5 * k)
      .select("probe_id", "vec_id")

    // reuse the cached brute-force ground truth from section 2 — the
    // relation is identical; a second cache would recompute it and pin a
    // duplicate copy in memory across the timing legs
    timeMedian("topk-pq-adc")(() => pqTopK.count())
    val phit = pqTopK.join(bt, Seq("probe_id", "vec_id"), "left_semi").count()
    println(f"[annbench] topk-pq-adc recall@$k ${phit.toDouble / math.max(1, itot)}%.4f ($phit of $itot)")
    for (nProbe <- Seq(4, 6)) {
      timeMedian(s"topk-ivfpq-np$nProbe")(() => ivfPqTopK(nProbe).count())
      val h = ivfPqTopK(nProbe)
        .join(bt, Seq("probe_id", "vec_id"), "left_semi").count()
      println(f"[annbench] topk-ivfpq-np$nProbe recall@$k ${h.toDouble / math.max(1, itot)}%.4f ($h of $itot)")
    }

    // ---- 4. unified router (round-8 task #1): the auto routes must land
    // within ~1.2× of the best manual configuration at this corpus size,
    // with the same recall story — the router encodes the ladder above as
    // defaults, so a drift here means the defaults no longer match the
    // measurements.
    def recallOf(label: String, df: DataFrame): Unit = {
      val h = df.select("probe_id", "vec_id")
        .join(bt, Seq("probe_id", "vec_id"), "left_semi").count()
      println(f"[annbench] $label recall@$k ${h.toDouble / math.max(1, itot)}%.4f ($h of $itot)")
    }
    def autoTopK: DataFrame = functions.Ann.topK(e, probes,
      "vec_id", "embedding", k, corpusCount = Some(n))
    timeMedian("topk-auto")(() => autoTopK.count())
    recallOf("topk-auto", autoTopK)

    val idxDir = java.nio.file.Files
      .createTempDirectory("annbench_idx_").toString
    val tIdx = System.nanoTime()
    functions.ProductQuantizer
      .writeIndex(e, "vec_id", "embedding", pq, model, idxDir)
    println(f"[annbench] index-write ${(System.nanoTime() - tIdx) / 1e9}%.3f s (one-time)")
    def autoIdxTopK: DataFrame = functions.Ann.topK(e, probes,
      "vec_id", "embedding", k, indexPath = Some(idxDir), nProbe = 6)
    timeMedian("topk-auto-idx")(() => autoIdxTopK.count())
    recallOf("topk-auto-idx", autoIdxTopK)

    // distributed-trained codebooks (round-8 task #7): every corpus row
    // contributes, no driver-side data — same serving path, so the leg
    // measures whether full-corpus training beats the 1000-row sample
    val tD = System.nanoTime()
    val pqD = functions.ProductQuantizer
      .trainDistributed(e, "embedding", m = 16, k = 64, iters = 4)
    println(f"[annbench] pq-train-dist ${(System.nanoTime() - tD) / 1e9}%.3f s (4 iters, full corpus)")
    def pqDistTopK: DataFrame = functions.ProductQuantizer
      .topK(e, probes, "vec_id", "embedding", pqD, k, rerank = 5 * k)
    timeMedian("topk-pq-dist")(() => pqDistTopK.count())
    recallOf("topk-pq-dist", pqDistTopK)
    bt.unpersist()

    def autoPairs: DataFrame = functions.Ann.nearDupPairs(e, "vec_id",
      "embedding", threshold, dim = dim, corpusCount = Some(n))
    timeMedian("pairs-auto")(() => autoPairs.count())
    val exact2 = exactPairs.cache(); val tot2 = exact2.count()
    val ah = autoPairs.select("a_id", "b_id")
      .join(exact2, Seq("a_id", "b_id"), "left_semi").count()
    println(f"[annbench] pairs-auto recall ${ah.toDouble / math.max(1, tot2)}%.4f ($ah of $tot2)")
    exact2.unpersist()
    spark.stop()
  }
}

package graft.streaming

import graft.functions.{IvfIndex, NativeCosine, ProductQuantizer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming ANN arrivals against the standing PQ codes index (round-8
  * verdict task #8) — the vector-space twin of
  * [[StreamingLsh.againstIndex]]: each arriving (id, vec) builds its ADC
  * lookup table against the BROADCAST codebooks (the models ride the
  * plan as literals — no state store, no per-batch training), explodes
  * its nProbe nearest IVF cells, and stream-static-joins the on-disk
  * codes table written by [[ProductQuantizer.writeIndex]].
  *
  * Two-stage scoring, both codegen'd:
  *   1. compressed-domain gate: on the unit sphere ‖p−x‖² = 2 − 2·cos,
  *      so cos ≈ 1 − adc/2; candidates are kept when that approximation
  *      clears `threshold − adcMargin` (the slack absorbs quantization
  *      error — PQ under-/over-shoots near the boundary);
  *   2. exact verify: survivors fetch their raw vector from `corpus`
  *      (a second stream-static equi-join on the id) and emit the EXACT
  *      NativeCosine, filtered at the true threshold.
  *
  * Emits (doc_id, matched_id, cos ≥ threshold), exactly once per pair
  * and batch: a corpus vector lives in exactly ONE cell of the codes
  * table, so multi-cell probing cannot duplicate a hit (unlike the
  * banded LSH paths, whose per-band multiplicity is documented there).
  * At scale: the codes join scans only the probed cells' code files
  * (m ints/row), and only probes × survivors rows ever touch the float
  * column. Zero growing state — the index is the static side, appended
  * offline as the corpus grows.
  */
object StreamingAnn {

  /** docs must carry (idCol, vecCol); may be a streaming DataFrame.
    * `indexPath` is a [[ProductQuantizer.writeIndex]] directory (codes
    * partitioned by cell + `pq_model`/`ivf_model` sidecars — loaded
    * here once, at plan time). `corpus` supplies raw vectors for the
    * exact verify, keyed by idCol. */
  def pqAgainstIndex(spark: SparkSession, docs: DataFrame,
                     indexPath: String, corpus: DataFrame, idCol: String,
                     vecCol: String, threshold: Double, nProbe: Int = 4,
                     adcMargin: Double = 0.15): DataFrame = {
    require(adcMargin >= 0, s"adcMargin must be >= 0, got $adcMargin")
    NativeCosine.register(spark)
    val model = ProductQuantizer.loadModel(spark, indexPath)
    val ivf = IvfIndex.loadModel(spark, indexPath)
    val codes = spark.read.parquet(s"$indexPath/codes")
    val arrivals = docs.select(col(idCol).as("doc_id"),
        col(vecCol).as("pv"),
        explode(IvfIndex.probeCells(col(vecCol), ivf, nProbe)).as("cell"))
      .withColumn("lut", ProductQuantizer.lut(col("pv"), model))
    val adc = ProductQuantizer.adc(col("codes"), col("lut"), model)
    val survivors = codes.join(arrivals, "cell")
      // a replayed document already in the index (at-least-once
      // delivery) must not self-match into "a duplicate of the corpus"
      .filter(col("vec_id") =!= col("doc_id"))
      .select(col("doc_id"), col("pv"), col("vec_id").as("matched_id"),
        adc.as("adc"))
      .filter(col("adc").isNotNull &&
        (lit(1d) - col("adc") / 2) >= threshold - adcMargin)
    survivors
      .join(corpus.select(col(idCol).as("matched_id"),
        col(vecCol).as("cv")), "matched_id")
      .select(col("doc_id"), col("matched_id"),
        call_function(NativeCosine.name, col("cv"), col("pv")).as("cos"))
      .filter(col("cos") >= threshold)
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.SimHash

/** Dev utility: measures what SimHash.blocksForCount actually buys — the
  * pre-verify CANDIDATE volume (Σ per key C(bucket, 2), the quadratic
  * hazard) with the minimal d+1-block banding vs the auto-sized banding,
  * plus the end-to-end nearDuplicatePairs time and the verified pair
  * count (which must be identical under both bandings: recall is exact by
  * pigeonhole regardless of n). Feeds the SCALE.md "candidate volume
  * tracks corpus" leg the round-6 verdict asked for.
  *
  * Usage: runMain graft.SimHashBench [sfDir] [d] [target] [reps]
  */
object SimHashBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/graft-sf1"
    val d = if (args.length > 1) args(1).toInt else 3
    val target = if (args.length > 2) args(2).toLong else 1024L
    val reps = if (args.length > 3) args(3).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val corpus = docs.count()
    val sizedN = SimHash.blocksForCount(corpus, d, target)
    println(s"[simhashbench] corpus=$corpus d=$d target=$target " +
      s"minimal_n=${d + 1} sized_n=$sizedN keys_per_doc=" +
      s"${SimHash.choose(sizedN, d)}")

    val sigs = docs
      .select(col("doc_id"), SimHash.signature(col("toks")).as("sig"))
      .localCheckpoint(true)

    // pre-verify candidate volume: Σ_keys C(bucket, 2)
    def candidates(n: Int): Long =
      sigs.select(explode(SimHash.bucketKeysSized(col("sig"), d, n)).as("k"))
        .groupBy("k").agg(count(lit(1)).as("c"))
        // Column `/` is double division — halve the (even) sum driver-side
        .agg(sum(col("c") * (col("c") - 1)).as("s"))
        .head().getLong(0) / 2

    def timed[T](label: String)(run: () => T): T = {
      run() // warm
      var out: T = null.asInstanceOf[T]
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        out = run()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[simhashbench] $label%-22s median ${times.sorted.apply(reps / 2)}%.3f s -> $out")
      out
    }

    // candidate-volume ladder: the count-based floor, then wider bandings
    val ladder = (Seq(d + 1, sizedN, 5, 6, 8).distinct.sorted
      .filter(n => n > d && SimHash.choose(n, d) <= 64))
    val vols = ladder.map(n => n -> timed(s"candidates n=$n")(() => candidates(n)))
    val adaptiveN = timed("blocksForCorpus")(() =>
      SimHash.blocksForCorpus(sigs, "sig", d, startN = sizedN).toLong).toInt

    def pairs(): Long =
      SimHash.nearDuplicatePairs(docs, "doc_id", "toks", d, corpus, target).count()
    val verified = timed("nearDuplicatePairs")(() => pairs())

    val volsJson = vols.map { case (n, v) => s""""$n":$v""" }.mkString(",")
    println(s"""{"metric":"simhash_banding","corpus":$corpus,"d":$d,""" +
      s""""count_sized_n":$sizedN,"measured_n":$adaptiveN,""" +
      s""""candidates":{$volsJson},"verified_pairs":$verified}""")
    spark.stop()
  }
}

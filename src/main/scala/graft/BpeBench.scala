package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.BpeTrainer

/** Dev utility: the BPE trainer's per-round cost curve — full recount
  * ([[BpeTrainer.train]]: every round re-shuffles the whole pair
  * vocabulary of the whole corpus) vs delta recount
  * ([[BpeTrainer.trainDelta]]: round 1 pays the full count, later rounds
  * recount only the documents containing the winning pair). The round-8
  * verdict asked for the curve: delta's per-round cost must FALL after
  * merge 1 as training walks down the pair-frequency curve, where the
  * full recount stays flat-at-corpus-cost — the gap is what makes
  * rounds-in-the-hundreds training plannable.
  *
  * Usage: runMain graft.BpeBench [sfDir] [rounds]
  */
object BpeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/graft-sf1"
    val rounds = if (args.length > 1) args(1).toInt else 8
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
      .select(col("doc_id"), col("text")).localCheckpoint(true)
    println(s"[bpebench] corpus=${docs.count()} rounds=$rounds")

    def sweep(label: String,
              run: ((BpeTrainer.MergeStep, Double) => Unit)
                => (org.apache.spark.sql.DataFrame, Seq[BpeTrainer.MergeStep]))
        : Unit = {
      val perRound = Seq.newBuilder[(Int, String, Long, Double)]
      val t0 = System.nanoTime()
      val (merged, _) = run((s, sec) =>
        perRound += ((s.round, s.pair, s.count, sec)))
      merged.write.mode("overwrite").format("noop").save()
      val total = (System.nanoTime() - t0) / 1e9
      perRound.result().foreach { case (r, p, c, sec) =>
        println(f"[bpebench] $label round $r%2d $sec%7.3f s  pair='$p' n=$c")
      }
      println(f"[bpebench] $label TOTAL $total%.3f s (incl. final corpus write)")
    }

    sweep("full ", cb => BpeTrainer.train(docs, "text", rounds, onRound = cb))
    sweep("delta", cb => BpeTrainer.trainDelta(docs, "text", rounds, onRound = cb))
    spark.stop()
  }
}

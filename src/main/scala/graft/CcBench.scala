package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: label-propagation vs alternating large-star/small-star
  * connected components (functions/DedupClusters.scala) on two graph
  * shapes — the REAL near-dup pair graph of a corpus (small dense
  * components: propagation's home turf) and a planted long chain (the
  * diameter degenerate the star variant exists for). Usage:
  * runMain graft.CcBench [sfDir] [chainLen] [reps]
  */
object CcBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/graft-sf1"
    val chainLen = if (args.length > 1) args(1).toInt else 20000
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

    // shape 1: the corpus' verified near-dup pairs (LSH → exact jaccard)
    val lshPairs = operators.DedupQueries.minhashPairs(spark, sfDir)
      .select("id_a", "id_b")
    lshPairs.cache().count()
    // shape 2: one chain component of length chainLen (diameter = n-1)
    val chain = spark.range(chainLen - 1)
      .select(col("id").as("a_id"), (col("id") + 1).as("b_id"))

    import java.util.concurrent.atomic.AtomicInteger
    // chain-prop runs hopsPerRound=2 (halved checkpoint count) capped at
    // 60 rounds — the point of the scenario is where propagation's
    // O(diameter) bill lands vs the star variant's O(log n)
    for (label <- Seq("lsh-prop", "lsh-star", "chain-prop-2hop",
        "chain-star")) {
      val rounds = new AtomicInteger
      def run(): Long = {
        val df = label match {
          case "lsh-prop" => functions.DedupClusters
            .connectedComponents(lshPairs, "id_a", "id_b",
              roundsOut = Some(rounds))
          case "lsh-star" => functions.DedupClusters
            .connectedComponentsStar(lshPairs, "id_a", "id_b",
              roundsOut = Some(rounds))
          case "chain-prop-2hop" => functions.DedupClusters
            .connectedComponents(chain, maxIter = 60, hopsPerRound = 2,
              roundsOut = Some(rounds))
          case _ => functions.DedupClusters
            .connectedComponentsStar(chain, roundsOut = Some(rounds))
        }
        df.count()
      }
      run() // warm
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = run()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val med = times.map(_._1).sorted.apply(reps / 2)
      println(f"[ccbench] $label%-16s median $med%.3f s " +
        f"(${times.head._2} nodes, ${rounds.get} rounds)")
    }
    spark.stop()
  }
}

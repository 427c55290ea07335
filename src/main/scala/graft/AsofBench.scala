package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: the merge as-of exec on a 90%-one-key fact side vs the
  * hot-key-salted rewrite (plans/AsofJoin.scala asofSkewSalted). A custom
  * exec's ClusteredDistribution exchange sends every row of a key to one
  * reducer and AQE skew splitting cannot rewrite it — this measures how
  * much of the merge serializes on the hot key and what the salt buys
  * back. Usage: runMain graft.AsofBench [leftRows] [reps]
  */
object AsofBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 4000000L
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // 90% of fact rows on user 1, the rest spread over 1000 users; micros
    // BIGINT time columns (the exec's native representation — no
    // timestamp codec noise in the measurement)
    def fact = spark.range(n).select(
      col("id").as("p_id"),
      when(pmod(col("id"), lit(10)) < 9, lit(1L))
        .otherwise(pmod(xxhash64(col("id")), lit(1000)) + 2).as("user_id"),
      (col("id") * 1000L).as("p_ts"))
    def dim = spark.range(n / 20).select(
      col("id").as("c_id"),
      (pmod(xxhash64(col("id"), lit(7)), lit(1001)) + 1).as("c_user"),
      (col("id") * 17000L).as("c_ts"))
    val horizon = 14L * 24 * 3600 * 1000000L
    val hot = Seq(1L).toDF("user_id")

    def merged = graft.plans.AsofJoinOp.asof(fact, dim,
      Seq("user_id"), Seq("c_user"), "p_ts", "c_ts", Seq("c_id"),
      horizon, strategy = "merge")
    def salted = graft.plans.AsofJoinOp.asofSkewSalted(fact, dim,
      Seq("user_id"), Seq("c_user"), "p_ts", "c_ts", Seq("c_id"),
      horizon, hotKeys = hot, saltBuckets = cpus.toInt.min(16))

    for ((label, df) <- Seq("merge-hotkey" -> (() => merged),
        "skewsalt" -> (() => salted))) {
      df().count() // warm
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val rows = df().count()
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      val med = times.map(_._1).sorted.apply(reps / 2)
      println(f"[asofbench] $label median $med%.3f s (${times.head._2} rows)")
    }
    spark.stop()
  }
}

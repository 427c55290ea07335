package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: custom interval-stab exec vs the BroadcastNestedLoopJoin
  * plan Spark gives the same keyless range predicate (the q_range_lookup
  * relation). Usage: runMain graft.RangeBench [sfDir] [reps]
  */
object RangeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def facts = Tables.load(spark, sfDir, "customer").select(col("c_custkey"),
      floor(col("c_acctbal") * 100 + 0.5).as("v"))
    def bands = Tables.load(spark, sfDir, "supplier")
      .select(col("s_suppkey").as("band_id"),
        floor(col("s_acctbal") * 100 + 0.5).as("lo"))
      .withColumn("hi", col("lo") + 50000L)
    def declarative = facts.join(bands,
      col("v") >= col("lo") && col("v") <= col("hi"))
    def custom = graft.plans.RangeJoinOp.rangeLookup(
      facts, bands, "v", "lo", "hi")
    // scenario 2: a 15× bigger interval side (order-price bands) — the
    // regime where BNLJ's O(n·m) separates from the stab's O(n log m)
    def bigBands = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderkey") % 10 === 0)
      .select(col("o_orderkey").as("band_id"),
        floor(col("o_totalprice") * 100 + 0.5).as("lo"))
      .withColumn("hi", col("lo") + 50000L)
    def bigFacts = Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey"),
        floor((col("c_acctbal") + 1000) * 100 * 25 + 0.5).as("v"))
    def bigDeclarative = bigFacts.join(bigBands,
      col("v") >= col("lo") && col("v") <= col("hi"))
    def bigCustom = graft.plans.RangeJoinOp.rangeLookup(
      bigFacts, bigBands, "v", "lo", "hi")
    // scenario 3: the spanning-interval degenerate — one catch-all band
    // over the 15k narrow ones. The pre-r5 prefix-max walk re-linearized
    // here (every probe walked all ~15k narrower intervals below the
    // spanning row's high prefix-max); the segment-max tree prunes the
    // non-matching subtrees, so stab stays near scenario 2's time.
    def spanBands = bigBands.unionByName(
      spark.range(1).select(lit(-1L).as("band_id"),
        lit(Long.MinValue / 4).as("lo"), lit(Long.MaxValue / 4).as("hi")))
    def spanDeclarative = bigFacts.join(spanBands,
      col("v") >= col("lo") && col("v") <= col("hi"))
    def spanCustom = graft.plans.RangeJoinOp.rangeLookup(
      bigFacts, spanBands, "v", "lo", "hi")
    for ((label, df) <- Seq("bnlj" -> (() => declarative),
        "stab" -> (() => custom),
        "bnlj-15k-bands" -> (() => bigDeclarative),
        "stab-15k-bands" -> (() => bigCustom),
        "bnlj-spanning" -> (() => spanDeclarative),
        "stab-spanning" -> (() => spanCustom))) {
      df().count() // warm
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = df().count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val med = times.map(_._1).sorted.apply(reps / 2)
      println(f"[rangebench] $label median $med%.3f s (${times.head._2} rows)")
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** THE library entry point: one call wires everything the engine adds to
  * a stock SparkSession — native codegen expressions, the custom join /
  * top-k strategies, the SQL table-valued surface, and the optimizer
  * rules — so "switching to this library" is:
  *
  *   val spark = GraftSession.builder("local[32]").getOrCreate()
  *   GraftSession.attach(spark)            // or, on a cluster:
  *   // --conf spark.sql.extensions=graft.functions.GraftExtensions
  *
  * `builder` pins the session defaults every Verify/Bench/test session in
  * this repo runs with (UTC, bounded shuffle partitions left to the
  * caller, nanos-as-long parquet reads for mixed-precision fixtures) and
  * routes extensions through [[graft.functions.GraftExtensions]] so a
  * cluster submit with the same conf behaves identically. `attach` is the
  * after-the-fact flavor for sessions the caller already owns (notebooks,
  * test harnesses) — idempotent, like every per-component install it
  * delegates to.
  */
object GraftSession {

  /** A builder preconfigured with the engine's session contract. */
  def builder(master: String, appName: String = "graft"): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  /** Idempotently attach every engine component to a live session:
    * native functions (cosine/simhash/jaccard/fingerprint/jaro/dot + the
    * UDF registry), the as-of / range-lookup / top-k strategies and their SQL
    * TVFs, and the optimizer rules (UDF promotion, rollup rewrite, join
    * elimination, window-top-k rewrite). */
  def attach(spark: SparkSession): SparkSession = {
    functions.NativeCosine.register(spark)
    functions.NativeCosine.enableUdfPromotion(spark)
    functions.NativeSimHash.register(spark)
    functions.NativeJaccard.register(spark)
    functions.NativeFingerprint.register(spark)
    functions.NativeJaro.register(spark)
    functions.NativeDot.register(spark)
    functions.Registry.registerAll(spark)
    plans.AsofJoinOp.install(spark)
    plans.RangeJoinOp.install(spark)
    plans.TopKPerGroup.install(spark)
    plans.AsofSql.install(spark)
    plans.RangeSql.install(spark)
    plans.TopKSql.install(spark)
    plans.RollupRewrite.attach(spark)
    plans.JoinElimination.install(spark)
    spark
  }
}

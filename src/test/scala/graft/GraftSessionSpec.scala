package graft

import org.apache.spark.sql.functions._

/** The one-call entry point: attach is idempotent and actually wires the
  * SQL surface (native function, TVF, optimizer rules). */
class GraftSessionSpec extends SparkSpec {

  test("attach wires functions, strategies, TVFs, and rules — twice is safe") {
    GraftSession.attach(spark)
    GraftSession.attach(spark) // idempotent
    // native function callable from SQL
    val c = spark.sql(
      "SELECT cosine_sim(ARRAY(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "ARRAY(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c")
      .head().getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
    // TVF surface resolves (topk_per_group over a tiny relation)
    spark.range(10).selectExpr("id % 2 AS g", "id AS v")
      .createOrReplaceTempView("gs_t")
    val k = spark.sql(
      "SELECT * FROM topk_per_group('gs_t', 'g', 'v', 2)").count()
    assert(k == 4L)
    // optimizer rules attached exactly once
    val opts = spark.experimental.extraOptimizations
    assert(opts.count(_ == plans.RollupRewrite) == 1)
    assert(opts.count(_ == plans.JoinElimination) == 1)
    val strats = spark.experimental.extraStrategies
    assert(strats.count(_ == plans.AsofJoinStrategy) == 1)
  }

  test("builder carries the session contract") {
    val b = GraftSession.builder("local[2]", "graft-contract-test")
    // getOrCreate returns the EXISTING test session (shared JVM), so
    // assert on the builder's intent via a fresh config read-back
    val s = b.getOrCreate()
    assert(s.conf.get("spark.sql.session.timeZone") == "UTC")
  }
}

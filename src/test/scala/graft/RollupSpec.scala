package graft

import graft.plans.RollupRewrite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

/** Materialized-rollup rewrite: result identity (collected BEFORE
  * registration vs after, so the rule itself cannot mask a wrong
  * answer), plan substitution (fact parquet scan replaced by the
  * checkpointed rollup's RDD scan), subset groupings, the global
  * aggregate, and the non-match guards. Integral measures only — the
  * documented bit-exactness contract. */
class RollupSpec extends SparkSpec with BeforeAndAfterAll {

  private lazy val fact = table("lineitem")

  private def scansParquet(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("FileScan parquet")

  private def scansRollup(df: DataFrame): Boolean = {
    val p = df.queryExecution.executedPlan.toString
    p.contains("ExistingRDD") && !p.contains("FileScan parquet")
  }

  private def q1 = fact.groupBy("l_returnflag", "l_linestatus")
    .agg(sum("l_linenumber").as("s"), count(lit(1)).as("c"))
    .orderBy("l_returnflag", "l_linestatus")
  private def q2 = fact.groupBy("l_returnflag")
    .agg(sum("l_suppkey").as("s"), min("l_partkey").as("mn"),
      max("l_partkey").as("mx"))
    .orderBy("l_returnflag")
  private def q3 = fact.agg(count(lit(1)).as("c"), sum("l_linenumber").as("s"))

  // ground truth BEFORE the rule can interfere
  private lazy val exp1 = q1.collect().map(_.toSeq)
  private lazy val exp2 = q2.collect().map(_.toSeq)
  private lazy val exp3 = q3.collect().map(_.toSeq)

  private lazy val registerRollup: Unit = {
    (exp1, exp2, exp3) // force ground truth first
    RollupRewrite.register(fact,
      groupCols = Seq("l_returnflag", "l_linestatus"),
      sumCols = Seq("l_linenumber", "l_suppkey"),
      minCols = Seq("l_partkey"), maxCols = Seq("l_partkey"))
  }

  override def afterAll(): Unit = {
    RollupRewrite.clear() // other suites must see pristine plans
    super.afterAll()
  }

  test("exact-grouping query rewrites to the rollup, same rows") {
    registerRollup
    assert(scansRollup(q1), s"not rewritten:\n${q1.queryExecution.executedPlan}")
    assert(q1.collect().map(_.toSeq).sameElements(exp1))
  }

  test("SUBSET grouping re-aggregates partials, min/max fold exactly") {
    registerRollup
    assert(scansRollup(q2), s"not rewritten:\n${q2.queryExecution.executedPlan}")
    assert(q2.collect().map(_.toSeq).sameElements(exp2))
  }

  test("global aggregate (no grouping) folds the whole rollup") {
    registerRollup
    assert(scansRollup(q3), s"not rewritten:\n${q3.queryExecution.executedPlan}")
    assert(q3.collect().map(_.toSeq).sameElements(exp3))
  }

  test("non-covered measure, distinct, and filtered aggs scan the fact") {
    registerRollup
    // l_quantity is not a registered measure
    val miss = fact.groupBy("l_returnflag").agg(sum("l_quantity"))
    assert(scansParquet(miss), "uncovered measure must not be rewritten")
    // distinct is never re-aggregable from sums
    val dist = fact.groupBy("l_returnflag")
      .agg(countDistinct("l_suppkey"))
    assert(scansParquet(dist), "distinct agg must not be rewritten")
    // FILTER (WHERE ...) aggregates are out of scope
    val filt = fact.groupBy("l_returnflag")
      .agg(sum(when(col("l_linenumber") > 3, col("l_suppkey"))))
    assert(scansParquet(filt), "non-column agg child must not be rewritten")
    // grouping outside the rollup keys
    val grp = fact.groupBy("l_shipdate").agg(sum("l_suppkey"))
    assert(scansParquet(grp), "non-subset grouping must not be rewritten")
  }

  test("the registry query q_rollup_rewrite actually FIRES the rule") {
    val before = RollupRewrite.rewriteCount
    val rows = q("q_rollup_rewrite").collect()
    assert(rows.nonEmpty)
    assert(RollupRewrite.rewriteCount > before,
      "q_rollup_rewrite ran without the rewrite firing — the oracle " +
        "would silently gate a plain fact scan")
  }

  test("count(lit(null)) is NOT rewritten — it counts nothing, not rows") {
    registerRollup
    val q = fact.groupBy("l_returnflag").agg(count(lit(null)).as("c"))
    assert(scansParquet(q), "count(null) must not become the group size")
    assert(q.collect().forall(_.getAs[Long]("c") == 0L))
  }

  test("a row-filtered fact never matches (predicate changes the set)") {
    registerRollup
    val f = fact.filter(col("l_linenumber") > 2)
      .groupBy("l_returnflag").agg(sum("l_suppkey"))
    assert(scansParquet(f), "filtered fact must not be rewritten")
  }
}

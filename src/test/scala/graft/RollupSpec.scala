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

  // —— round-8 additions (verdict task #2). These clear the registry, so
  // they stay AFTER the legs that rely on the lazy shared registration.

  test("avg folds as sum-of-sums over sum-of-non-null-counts") {
    RollupRewrite.clear()
    // def, not val: a Dataset memoizes its QueryExecution, so a val
    // planned before registration would pin the un-rewritten plan
    def q = fact.groupBy("l_returnflag")
      .agg(avg("l_suppkey").as("a"), avg("l_linenumber").as("b"),
        sum("l_suppkey").as("s"))
      .orderBy("l_returnflag")
    val exp = q.collect().map(_.toSeq)
    RollupRewrite.register(fact,
      groupCols = Seq("l_returnflag", "l_linestatus"),
      sumCols = Seq("l_suppkey", "l_linenumber"))
    assert(scansRollup(q), s"avg not rewritten:\n${q.queryExecution.executedPlan}")
    assert(q.collect().map(_.toSeq).sameElements(exp))
  }

  test("avg over a NULL-bearing measure divides by the non-null count") {
    RollupRewrite.clear()
    import spark.implicits._
    // parquet-backed like a real fact: a LocalRelation fixture gets
    // collapsed by column pruning before the user-rule batch, so
    // sameResult could never match it (the rule targets TABLES)
    val dir = java.nio.file.Files.createTempDirectory("graft_nullavg_")
      .toString
    Seq((1, "x", Some(10L)), (1, "y", None), (1, "x", Some(20L)),
      (2, "x", None), (2, "y", None)).toDF("g", "s", "v")
      .write.mode("overwrite").parquet(dir)
    val f = spark.read.parquet(dir)
    def q = f.groupBy("g").agg(avg("v").as("a")).orderBy("g")
    val exp = q.collect().map(_.toSeq) // (1 → 15.0, 2 → null)
    assert(exp(0)(1) == 15.0 && exp(1)(1) == null, s"fixture drifted: ${exp.toSeq}")
    val before = RollupRewrite.rewriteCount
    RollupRewrite.register(f, groupCols = Seq("g", "s"), sumCols = Seq("v"))
    assert(q.collect().map(_.toSeq).sameElements(exp),
      "rewritten avg must divide by the NON-NULL count (and give NULL " +
        "for an all-NULL group), exactly like Average")
    assert(RollupRewrite.rewriteCount > before, "avg rewrite never fired")
  }

  test("registerPersisted: rollup survives as a table; loadPersisted re-attaches") {
    RollupRewrite.clear()
    val dir = java.nio.file.Files.createTempDirectory("graft_rollup_")
      .toString
    def q = fact.groupBy("l_linestatus")
      .agg(sum("l_suppkey").as("s"), avg("l_suppkey").as("a"),
        count(lit(1)).as("c"))
      .orderBy("l_linestatus")
    val exp = q.collect().map(_.toSeq)
    RollupRewrite.registerPersisted(fact, dir,
      groupCols = Seq("l_returnflag", "l_linestatus"),
      sumCols = Seq("l_suppkey"))
    def scansRollupTable(df: DataFrame): Boolean = {
      val p = df.queryExecution.executedPlan.toString
      p.contains("graft_rollup_") && !p.contains("lineitem")
    }
    assert(scansRollupTable(q),
      s"not served from the written rollup:\n${q.queryExecution.executedPlan}")
    assert(q.collect().map(_.toSeq).sameElements(exp))
    // a "new session": registry wiped, re-attach from the table alone —
    // the contract is decoded from the rollup schema, no fact scan
    RollupRewrite.clear()
    RollupRewrite.loadPersisted(fact, dir)
    assert(scansRollupTable(q), "loadPersisted did not re-attach")
    assert(q.collect().map(_.toSeq).sameElements(exp))
  }

  test("refreshAppended: incremental merge == full rebuild, and serves") {
    RollupRewrite.clear()
    val dir = java.nio.file.Files.createTempDirectory("graft_refresh_")
      .toString
    // append-only story: the fact arrives in two slices
    val slice1 = fact.filter(col("l_orderkey") % 3 =!= 0)
    val slice2 = fact.filter(col("l_orderkey") % 3 === 0)
    RollupRewrite.registerPersisted(slice1, dir,
      groupCols = Seq("l_returnflag", "l_linestatus"),
      sumCols = Seq("l_suppkey"), minCols = Seq("l_partkey"),
      maxCols = Seq("l_partkey"))
    RollupRewrite.clear()
    // slice2 lands: merge partials, never rescan slice1
    RollupRewrite.refreshAppended(fact, dir, slice2)
    // table content == a from-scratch build over the FULL fact
    val refreshed = spark.read.parquet(dir)
      .orderBy("l_returnflag", "l_linestatus").collect().map(_.toSeq)
    val rebuilt = RollupRewrite.build(fact,
        Seq("l_returnflag", "l_linestatus"), Seq("l_suppkey"),
        Seq("l_partkey"), Seq("l_partkey"))
      .orderBy("l_returnflag", "l_linestatus").collect().map(_.toSeq)
    assert(refreshed.toSeq == rebuilt.toSeq,
      "merged partials must equal the full rebuild exactly")
    // and the refreshed rollup now serves queries over the full fact
    def q = fact.groupBy("l_returnflag")
      .agg(sum("l_suppkey").as("s"), min("l_partkey").as("mn"),
        avg("l_suppkey").as("a"))
      .orderBy("l_returnflag")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("graft_refresh_") && !plan.contains("lineitem"),
      s"not served from the refreshed rollup:\n$plan")
    val direct = fact.filter(lit(true)).groupBy("l_returnflag")
      .agg(sum("l_suppkey").as("s"), min("l_partkey").as("mn"),
        avg("l_suppkey").as("a"))
      .orderBy("l_returnflag")
    // filter(lit(true)) perturbs the plan so THIS one scans the fact
    assert(q.collect().map(_.toSeq).toSeq
      == direct.collect().map(_.toSeq).toSeq)
    RollupRewrite.clear()
  }

  test("the smallest matching rollup wins when several match") {
    RollupRewrite.clear()
    def q = fact.groupBy("l_returnflag").agg(sum("l_linenumber").as("s"))
      .orderBy("l_returnflag")
    val exp = q.collect().map(_.toSeq)
    // register the FINE rollup first (insertion order must not win),
    // in-memory; the COARSE one persisted, so the chosen source is
    // visible in the physical plan (FileScan of the rollup dir vs RDD)
    RollupRewrite.register(fact,
      groupCols = Seq("l_returnflag", "l_linestatus"),
      sumCols = Seq("l_linenumber"))
    val dir = java.nio.file.Files.createTempDirectory("graft_coarse_")
      .toString
    RollupRewrite.registerPersisted(fact, dir,
      groupCols = Seq("l_returnflag"), sumCols = Seq("l_linenumber"))
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("graft_coarse_") && !p.contains("lineitem"),
      s"coarse (1-key) rollup must beat the fine (2-key) one:\n$p")
    assert(q.collect().map(_.toSeq).sameElements(exp))
    // a query only the fine rollup can answer still routes there
    def q2 = fact.groupBy("l_returnflag", "l_linestatus")
      .agg(sum("l_linenumber").as("s"))
    assert(scansRollup(q2) && !q2.queryExecution.executedPlan.toString
      .contains("graft_coarse_"), "2-key grouping must use the fine rollup")
  }

  test("duplicate fact output names are rejected at registration") {
    val dup = fact.select(col("l_returnflag"), col("l_suppkey").as("x"),
      col("l_partkey").as("x"))
    intercept[IllegalArgumentException] {
      RollupRewrite.register(dup, groupCols = Seq("l_returnflag"),
        sumCols = Seq("x"))
    }
  }

  test("unregister drops a fact's rollups — the staleness-contract lever") {
    RollupRewrite.clear()
    RollupRewrite.register(fact, groupCols = Seq("l_returnflag"),
      sumCols = Seq("l_suppkey"))
    def q = fact.groupBy("l_returnflag").agg(sum("l_suppkey").as("s"))
    assert(scansRollup(q))
    assert(RollupRewrite.unregister(fact) == 1)
    assert(scansParquet(q), "after unregister the fact must scan again")
  }

  test("capacity bound evicts the oldest rollup, newest keeps serving") {
    RollupRewrite.clear()
    try {
      RollupRewrite.setCapacity(2)
      RollupRewrite.register(fact, groupCols = Seq("l_returnflag"),
        sumCols = Seq("l_suppkey"))
      RollupRewrite.register(fact, groupCols = Seq("l_linestatus"),
        sumCols = Seq("l_suppkey"))
      RollupRewrite.register(fact, groupCols = Seq("l_returnflag", "l_linestatus"),
        sumCols = Seq("l_linenumber"))
      assert(RollupRewrite.size == 2, "third registration must evict one")
      // the FIRST registration is gone: its query scans the fact again —
      // eviction costs only the acceleration, never correctness
      def qOld = fact.groupBy("l_returnflag").agg(sum("l_suppkey").as("s"))
      def qNew = fact.groupBy("l_returnflag", "l_linestatus")
        .agg(sum("l_linenumber").as("s"))
      assert(scansParquet(qOld), "evicted rollup must not serve")
      assert(scansRollup(qNew), "resident rollup must keep serving")
      // shrinking capacity evicts immediately
      RollupRewrite.setCapacity(1)
      assert(RollupRewrite.size == 1)
    } finally {
      RollupRewrite.setCapacity(64)
      RollupRewrite.clear()
    }
  }
}

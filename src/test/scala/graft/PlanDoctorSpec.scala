package graft

import graft.plans.PlanDoctor
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PlanDoctor rule triggers on deliberately bad plans, and silence on
  * the corresponding good plans — the library API the registry-wide
  * lint (PlanLintSpec) delegates to.
  */
class PlanDoctorSpec extends SparkSpec {

  private def rules(df: org.apache.spark.sql.DataFrame): Set[String] =
    PlanDoctor.diagnose(df).filter(_.severity == "risk").map(_.rule).toSet

  test("cartesian-product fires on a keyless join, silent on an equi-join") {
    val a = table("nation"); val b = table("region")
    // below the broadcast threshold a cross joins as BNLJ — flagged under
    // the other keyless rule; force the true CartesianProduct shape
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      assert(rules(a.crossJoin(b)).contains("cartesian-product"))
    } finally spark.conf.set(key, old)
    assert(rules(a.crossJoin(b)).contains("nested-loop-join"),
      "broadcast flavor of the keyless join is still flagged")
    assert(!rules(a.join(b, col("n_regionkey") === col("r_regionkey")))
      .contains("cartesian-product"))
  }

  test("nested-loop-join fires on a non-equi join, not on a scalar attach") {
    val o = table("orders"); val c = table("customer")
    val theta = o.join(c, col("o_custkey") > col("c_custkey"))
    assert(rules(theta).contains("nested-loop-join"))
    // scalar-subquery-as-join: ONE-row build side is the documented shape
    val tot = o.agg(sum(col("o_totalprice")).as("t"))
    val share = o.crossJoin(broadcast(tot))
      .select(col("o_orderkey"), (col("o_totalprice") / col("t")).as("s"))
    assert(!rules(share).contains("nested-loop-join"))
  }

  test("global-window fires over a raw corpus, silent over an aggregate") {
    val docs = table("documents")
    val raw = docs.withColumn("rn",
      row_number().over(Window.orderBy("doc_id")))
    assert(rules(raw).contains("global-window"))
    val agg = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(Window.orderBy("n")))
    assert(!rules(agg).contains("global-window"),
      "lang-grain relation is alphabet-bounded — no risk")
    val partitioned = docs.withColumn("rn",
      row_number().over(Window.partitionBy("lang").orderBy("doc_id")))
    assert(!rules(partitioned).contains("global-window"))
  }

  test("filter-not-pushed warns when the scan pushed nothing") {
    // a null-TOLERANT predicate on a computed value defeats pushdown
    // entirely (null-intolerant ones still push an inferred IsNotNull)
    val opaque = table("documents")
      .filter(coalesce(col("n_chars"), lit(0L)) % 7 === 3)
    val warns = PlanDoctor.diagnose(opaque)
      .filter(_.severity == "warn").map(_.rule).toSet
    assert(warns.contains("filter-not-pushed"))
    // a plain comparison pushes — no warning
    val pushed = table("documents").filter(col("n_chars") > 100)
    val w2 = PlanDoctor.diagnose(pushed)
      .filter(_.severity == "warn").map(_.rule)
    assert(!w2.contains("filter-not-pushed"))
  }

  test("diagnoseExecuted grades the final adaptive plan (AQE broadcast " +
    "demotion invisible to the pre-execution diagnose)") {
    val bt = "spark.sql.autoBroadcastJoinThreshold"
    val abt = "spark.sql.adaptive.autoBroadcastJoinThreshold"
    val old = spark.conf.get(bt)
    try {
      // static planning sees no broadcast budget -> SortMergeJoin; AQE's
      // own runtime threshold then demotes on observed build-side stats
      spark.conf.set(bt, "-1")
      spark.conf.set(abt, "10485760")
      val df = table("orders").join(table("customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      val pre = df.queryExecution.executedPlan.toString
      assert(pre.contains("SortMergeJoin"),
        s"expected the initial plan to be a sort-merge join:\n$pre")
      val findings = PlanDoctor.diagnoseExecuted(df)
      val post = df.queryExecution.executedPlan.toString
      assert(post.contains("BroadcastHashJoin"),
        s"AQE did not re-plan the join to broadcast at runtime:\n$post")
      assert(!findings.exists(_.severity == "risk"),
        findings.map(_.render).toString)
    } finally { spark.conf.set(bt, old); spark.conf.unset(abt) }
  }

  test("expensive-join-predicate fires on a pushed verify, silent behind " +
      "the per-pair aggregate barrier") {
    val d = table("documents").select(col("doc_id"), col("lang"),
      col("text"), length(col("text")).as("len"))
    // the hazard shape: filter over the scored projection is pushed into
    // the join condition, so the DP runs before the cheap conjuncts
    val pushed = d.as("a").join(d.as("b"),
        col("a.lang") === col("b.lang") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("x"), col("b.doc_id").as("y"),
        levenshtein(col("a.text"), col("b.text"), 20).as("dist"))
      .filter(col("dist") >= 0)
    assert(rules(pushed).contains("expensive-join-predicate"))
    // the fix shape: same result, verify behind the aggregate —
    // q_editdist_pairs' registered plan must stay clean
    assert(!rules(q("q_editdist_pairs")).contains("expensive-join-predicate"))
    assert(!rules(q("q_minhash_lsh")).contains("expensive-join-predicate"))
  }

  test("a healthy aggregate query yields zero risk findings") {
    val q = table("lineitem").groupBy("l_returnflag")
      .agg(sum(col("l_quantity")).as("s")).orderBy("l_returnflag")
    assert(rules(q).isEmpty, PlanDoctor.diagnose(q).map(_.render).toString)
  }
}

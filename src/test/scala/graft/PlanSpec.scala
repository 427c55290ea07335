package graft

import org.apache.spark.sql.functions._

/** Plan-shape assertions (SURVEY.md §5.2 item 5): the 100 TB-relevant
  * physical-plan properties — pushdown, pruning, broadcast, partial
  * aggregation, codegen — hold for the declared queries. */
class PlanSpec extends SparkSpec {

  private def executed(name: String): String =
    q(name).queryExecution.executedPlan.toString

  test("q_scan_prune: filter pushed to the parquet scan") {
    val plan = executed("q_scan_prune")
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45"),
      s"no pushed filter in:\n$plan")
  }

  test("q_scan_prune: read schema pruned to referenced columns") {
    val plan = executed("q_scan_prune")
    val readSchema = plan.split("ReadSchema:")(1).split("\n")(0)
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_returnflag") && !readSchema.contains("l_shipdate"),
      s"unpruned read schema: $readSchema")
  }

  test("q_join_broadcast: plan uses BroadcastHashJoin") {
    assert(executed("q_join_broadcast").contains("BroadcastHashJoin"))
  }

  test("q_agg_group: partial + final hash aggregation around one shuffle") {
    val plan = executed("q_agg_group")
    assert("HashAggregate".r.findAllIn(plan).length >= 2,
      s"no partial/final aggregate split:\n$plan")
  }

  test("q_agg_group: whole-stage codegen covers the aggregate") {
    // AQE finalizes the physical plan lazily — execute first, then inspect.
    val df = q("q_agg_group")
    df.collect()
    // codegen spans render as "*(n) Operator" in the simple plan string
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)") && plan.contains("*(2)"),
      s"no whole-stage-codegen spans in:\n$plan")
  }

  test("q_knn_join: probes broadcast — no shuffle of the corpus side") {
    val plan = executed("q_knn_join")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"knn join did not broadcast the probe side:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      "knn join degenerated to a cartesian product")
  }

  test("q_tpch_q3: dims broadcast, top-k is TakeOrderedAndProject") {
    val df = q("q_tpch_q3")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"customer side not broadcast:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"limit-10 materialized a global sort:\n$plan")
  }

  test("q_tpch_q5: the only shuffle joins are on the fact keys") {
    val df = q("q_tpch_q5")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // region/nation/supplier chain must collapse into broadcasts; only
    // orders⋈customer and lineitem⋈orders may shuffle.
    val shuffleJoins = "SortMergeJoin|ShuffledHashJoin".r
      .findAllIn(plan).length
    assert(shuffleJoins <= 2, s"dim join shuffled ($shuffleJoins):\n$plan")
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 2,
      s"dim chain not broadcast:\n$plan")
  }

  test("q_filter_eq: predicate reaches the scan as a pushed filter") {
    val plan = executed("q_filter_eq")
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(c_mktsegment,BUILDING)"),
      s"equality predicate not pushed:\n$plan")
  }

  test("q_dedup_exact: corpus-wide shuffle keyed by hash, not text") {
    // materialize=false: the production query localCheckpoints pass 1
    // (hiding its Exchange behind an ExistingRDD scan); the twin keeps the
    // full lineage visible so the shuffle shape stays assertable.
    val plan = operators.DedupQueries.dedupExact(spark, sf, materialize = false)
      .queryExecution.executedPlan.toString
    val shuffles = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    // pass 1 (all documents) exchanges on xxhash64 of the normalized text;
    // only the duplicate-bounded resolve pass may carry the norm string.
    assert(shuffles.exists(l => l.contains("hk#") && !l.contains("norm#")),
      s"no hash-keyed corpus exchange in:\n$plan")
  }

  test("dedupExact: multi-hash probe broadcasts under the cap, shuffles past it") {
    // the fixtures contain zero exact-dup groups (AQE would prune an empty
    // probe branch) — duplicate every document so every group is
    // multi-member and the probe join must materialize in the final plan
    val base = table("documents").select("doc_id", "text")
    val dupes = base.unionByName(
      base.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    // AQE finalizes the join choice lazily — execute, then inspect
    def finalPlan(): String = {
      val df = operators.DedupQueries.dedupExactDf(spark, dupes)
      df.collect()
      df.queryExecution.executedPlan.toString
    }
    // default cap (4M keys): the duplicate-candidate set broadcasts
    val bPlan = finalPlan()
    assert(bPlan.contains("BroadcastHashJoin"),
      s"probe join not broadcast under the cap:\n$bPlan")
    // cap 0: every candidate set is "too big" — the SAME join must fall
    // back to a shuffle join (no driver-side broadcast of unbounded keys)
    spark.conf.set("spark.graft.dedup.maxBroadcastKeys", "0")
    try {
      val sPlan = finalPlan()
      assert(!sPlan.contains("BroadcastHashJoin"),
        s"probe join still broadcast past the cap:\n$sPlan")
      assert(sPlan.contains("ShuffledHashJoin"),
        s"no shuffle-hash fallback join in:\n$sPlan")
      // gate-identical results either way
      val a = operators.DedupQueries.dedupExactDf(spark, dupes).collect().toSeq
      spark.conf.unset("spark.graft.dedup.maxBroadcastKeys")
      val b = operators.DedupQueries.dedupExactDf(spark, dupes).collect().toSeq
      assert(a == b, "gated plans disagree on results")
    } finally spark.conf.unset("spark.graft.dedup.maxBroadcastKeys")
  }

  test("q_ngram_jaccard: gram-grain key-equality join, no array verify join") {
    // the intersection count comes from a posting-list self-join on the
    // 60-bit (lang, ft, gram) md5 key — narrow rows, key-equality — not
    // from a doc×doc join dragging full gram arrays through the joiner
    // (the pre-round-9 shape: 10.6M array verifies at sf1)
    val plan = executed("q_ngram_jaccard")
    assert(plan.contains("k#"), s"md5 gram key missing from the join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"gram join degenerated to a product:\n$plan")
    assert(!plan.contains("grams#"),
      s"gram arrays crossed the Materialize boundary into the join:\n$plan")
  }

  test("q_fuzzy_pairs: noun-block self-join is grid-salted (bounded fan-out)") {
    // nouns are a bounded Zipfian vocabulary — the self-join must carry
    // the S×S grid coordinates so a hot noun bucket spreads over S²
    // shuffle partitions instead of going quadratic on one reducer
    val plan = executed("q_fuzzy_pairs")
    assert(plan.contains("ga#") && plan.contains("gb#"),
      s"grid-salt coordinates missing from the join keys:\n$plan")
  }

  test("q_editdist_pairs: prefix-block self-join is grid-salted (bounded fan-out)") {
    // the (lang, 24-char prefix) blocking key is Zipfian on boilerplate
    // corpora — the self-join must carry the S×S grid coordinates so a
    // hot prefix block's |B|² banded-DP work spreads over S² shuffle
    // cells instead of serializing on one reducer
    val plan = executed("q_editdist_pairs")
    assert(plan.contains("ga#") && plan.contains("gb#"),
      s"grid-salt coordinates missing from the join keys:\n$plan")
  }

  test("q_scalar_subquery: the aggregate joins in as a broadcast, not a shuffle") {
    val plan = executed("q_scalar_subquery")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"scalar aggregate not broadcast:\n$plan")
  }

  test("q_embed_neardup: pair generation broadcasts one side") {
    val plan = executed("q_embed_neardup")
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"near-dup pair join did not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      "near-dup pair join degenerated to a cartesian product")
  }

  test("q_correlated_agg: decorrelated to ONE exchange on the correlation key") {
    val plan = executed("q_correlated_agg")
    val exchanges = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.size == 1 && exchanges.head.contains("o_custkey"),
      s"expected a single o_custkey exchange, got:\n$plan")
  }

  test("q_null_safe_join: <=> keys plan as a broadcast HASH join") {
    // EqualNullSafe is a first-class equi-join key in Spark — the NULL
    // group hashes like any other value. A nested-loop fallback here would
    // be the 100 TB failure mode.
    val plan = executed("q_null_safe_join")
    assert(plan.contains("BroadcastHashJoin"),
      s"null-safe join did not hash-join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"null-safe join fell back to nested loop:\n$plan")
  }

  test("q_lateral: correlated lateral aggregate is decorrelated, not per-row") {
    // Catalyst rewrites LATERAL (SELECT agg … WHERE key = outer.key) into
    // aggregate-then-join; the plan must show a HashAggregate feeding a
    // join, with no per-row subquery execution node.
    val plan = executed("q_lateral")
    assert(plan.contains("HashAggregate"),
      s"lateral aggregate not decorrelated to an aggregate:\n$plan")
    assert(plan.contains("Join") || plan.contains("BroadcastHashJoin"),
      s"no join in the decorrelated lateral plan:\n$plan")
  }

  test("q_recursive_cte: 80-month spine, recursion never touches fact rows") {
    val df = q("q_recursive_cte")
    val rows = df.collect()
    assert(rows.length == 80, s"spine length ${rows.length}, expected 80")
    assert(rows.head.getString(0) == "1995-01" &&
      rows.last.getString(0) == "2001-08")
    // every month in range is present exactly once, counts non-negative
    assert(rows.map(_.getString(0)).distinct.length == 80)
    assert(rows.forall(_.getLong(1) >= 0L))
  }

  test("q_dpp_join: fact scan is dynamically partition-pruned by the dim filter") {
    val df = q("q_dpp_join")
    df.collect() // DPP shows in the EXECUTED scan's partition filters
    val plan = df.queryExecution.executedPlan
    val scans = graft.plans.PlanAllowlist.flatten(plan)
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    val pruned = scans.filter(_.partitionFilters.exists(_.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruningExpression])))
    assert(pruned.nonEmpty,
      s"no DynamicPruningExpression in any scan's partition filters:\n$plan")
    // the runtime prune must actually bite: ~21 Q2 months of ~80 total
    val read = pruned.head.metrics.get("numPartitions").map(_.value)
    assert(read.exists(n => n > 0 && n <= 30),
      s"expected <=30 month partitions read after pruning, got $read")
  }

  test("no query degenerates to a cartesian product (except q_join_cross)") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(_ == "q_join_cross") // the explicit small×small cross join
      .filter { name =>
        q(name).queryExecution.executedPlan.toString.contains("CartesianProduct")
      }
    assert(offenders.isEmpty, s"unintended cartesian products: $offenders")
  }

  test("session defaults: AQE on, shuffle partitions bounded") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    assert(spark.conf.get("spark.sql.shuffle.partitions").toInt <= 64)
  }
}

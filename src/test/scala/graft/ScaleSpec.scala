package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
import org.apache.spark.sql.functions._

/** 100 TB-mechanics demonstrations on local fixtures: partition layout
  * pruning, bucketed co-located joins, and dynamic partition pruning —
  * the storage-side levers SURVEY.md §7.0 commits to. */
class ScaleSpec extends SparkSpec {

  private lazy val partedDir: String = {
    val dir = Files.createTempDirectory("graft-parted").toString
    table("documents").write.mode("overwrite")
      .partitionBy("lang").parquet(dir)
    dir
  }

  test("static partition pruning: lang filter prunes directories") {
    val df = spark.read.parquet(partedDir).filter(col("lang") === "es")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"),
      s"no partition filter in:\n$plan")
    // correctness: pruned read equals filtered full read
    assert(df.count() ==
      table("documents").filter(col("lang") === "es").count())
  }

  test("dynamic partition pruning: dim filter prunes fact partitions") {
    val fact = spark.read.parquet(partedDir)
    val dim = table("documents").select("lang").distinct()
      .filter(col("lang").isin("es", "zh"))
    val joined = fact.join(dim, "lang")
    val plan = joined.queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("dynamicpruning"),
      s"no DPP subquery in plan:\n$plan")
    assert(joined.count() ==
      table("documents").filter(col("lang").isin("es", "zh")).count())
  }

  test("bucketed join: co-located tables join without an Exchange") {
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    assert(warehouse.nonEmpty)
    table("orders").write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_bucketed")
    table("lineitem")
      .select("l_orderkey", "l_quantity")
      .write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_bucketed")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("lineitem_bucketed")
        .join(spark.table("orders_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      // correctness vs the plain join
      val expected = table("lineitem").join(table("orders"),
        col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_bucketed")
      spark.sql("DROP TABLE IF EXISTS lineitem_bucketed")
    }
  }

  test("AQE skew-join handling is enabled for the session") {
    assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
  }

  test("runtime bloom filter prunes the fact side of a selective dim join") {
    // At 100 TB a selective dim predicate should reach the fact scan as a
    // runtime bloom filter (row-level semi-join reduction before the
    // shuffle). The size thresholds that gate injection are tuned for
    // clusters, so pin them down to fixture scale for the assertion.
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = keys.map { case (k, _) => k -> conf.getOption(k) }
    keys.foreach { case (k, v) => conf.set(k, v) }
    try {
      val ord = table("orders").filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey", "o_orderpriority")
      val j = table("lineitem").select("l_orderkey", "l_quantity")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(sum("l_quantity"))
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"no runtime bloom filter in:\n$plan")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _)) }
  }

  /** Sum of the `dataSize` metric over every shuffle exchange the query
    * actually executed — measured bytes, not plan-string inference. Walks
    * through AQE wrappers (AdaptiveSparkPlanExec / QueryStageExec); reused
    * exchanges count once, at their original.
    */
  private def shuffleDataSize(df: DataFrame): Long = {
    df.collect()
    def walk(p: SparkPlan): Seq[ShuffleExchangeLike] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case s: QueryStageExec        => walk(s.plan)
      case _: ReusedExchangeExec    => Seq.empty
      case e: ShuffleExchangeLike   => e +: p.children.flatMap(walk)
      case _                        => p.children.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan)
      .map(e => e.metrics.get("dataSize").fold(0L)(_.value)).sum
  }

  test("measured shuffle bytes: hash-grouped dedup shuffles a fraction of the text") {
    // The q_dedup_exact contract — pass 1 exchanges (hash, id), never the
    // document bodies — asserted on the executed exchanges' dataSize
    // metric, not the plan string: total shuffled bytes must be well under
    // the corpus text volume.
    val textBytes = table("documents")
      .agg(sum(length(col("text")))).head().getLong(0)
    val shuffled = shuffleDataSize(
      operators.DedupQueries.dedupExact(spark, sf, materialize = false))
    assert(shuffled > 0, "expected at least one executed shuffle")
    assert(shuffled < textBytes / 2,
      s"dedup shuffled $shuffled bytes vs $textBytes bytes of text")
  }

  test("measured shuffle bytes: dedup tail stays sketch-sized, never text-sized") {
    // The LSH/simhash/cluster/curation family's scale contract: exchanges
    // carry SKETCHES (signatures, band keys, hashes, ids, labels), never
    // the document bodies. Budgets are pinned at ~2x the measured healthy
    // value at this SF — a regression that starts shuffling text (or fans
    // out candidate pairs) overshoots 2x immediately, while normal noise
    // (metric accounting, partition counts) stays well inside it.
    val textBytes = table("documents")
      .agg(sum(length(col("text")))).head().getLong(0)
    val budgets = Seq(   // query -> max shuffled bytes as a multiple of text
      "q_minhash_lsh" -> 0.10,       // measured 0.045: signatures + band keys
      "q_simhash_dedup" -> 0.02,     // measured 0.009: one 64-bit sketch/doc
      "q_dedup_cluster" -> 0.02,     // measured 0.007: edges + labels
      "q_curation_pipeline" -> 0.60) // measured 0.286: capstone keeps kept-doc ids + stats

    budgets.foreach { case (name, mult) =>
      val shuffled = shuffleDataSize(q(name))
      info(f"$name%-20s shuffled=$shuffled%9d text=$textBytes%9d ratio=${shuffled.toDouble / textBytes}%.3f")
      assert(shuffled > 0, s"$name: expected at least one executed shuffle")
      assert(shuffled < (textBytes * mult).toLong,
        s"$name shuffled $shuffled bytes vs budget ${(textBytes * mult).toLong} " +
          s"(${mult}x of $textBytes text bytes)")
    }
  }

  test("measured shuffle bytes: heavy-hitters recount shuffles candidates, not the corpus") {
    // Pass 1 (the MG sketch agg, executed eagerly inside exactHeavyHitters)
    // exchanges ≤ k counter-pairs per partition by construction — the
    // Aggregator's partial/merge contract. What the returned plan executes
    // is pass 2: the candidate-filtered exact recount + final sort. Its
    // exchanges must carry word-count pairs for ≤ denom candidate words,
    // never corpus-sized token volume.
    val textBytes = table("documents")
      .agg(sum(length(col("text")))).head().getLong(0)
    val shuffled = shuffleDataSize(q("q_heavy_hitters"))
    info(f"q_heavy_hitters shuffled=$shuffled%9d text=$textBytes%9d ratio=${shuffled.toDouble / textBytes}%.4f")
    assert(shuffled > 0, "expected at least one executed shuffle")
    assert(shuffled < (textBytes * 0.05).toLong,
      s"heavy-hitters recount shuffled $shuffled bytes vs $textBytes text bytes")
  }

  test("measured candidate volume: LSH hot-bucket cap keeps the verify-join input linear") {
    // The one quadratic hazard of the MinHash pipeline: c docs sharing a
    // band bucket = c²/2 candidate pairs. Plant a 200-doc boilerplate
    // bucket and measure the verify-join input (candidate count) directly:
    // capped, the bucket contributes its 199-edge id-chain; uncapped it
    // contributes the 19 900-pair clique. The cap must hold the TOTAL
    // candidate volume to the base corpus' pairs + a linear remainder.
    import spark.implicits._
    val docs = table("documents").select("doc_id", "text")
    val boiler = (0 until 200).map(i =>
      (91000L + i, "shared boilerplate banner text on every mirrored page"))
      .toDF("doc_id", "text")
    val corpus = docs.unionByName(boiler)
    val base = functions.MinHashDedup
      .candidatePairs(docs, "doc_id", "text").count()
    val capped = functions.MinHashDedup
      .candidatePairs(corpus, "doc_id", "text", maxBucket = 16).count()
    val clique = 200L * 199 / 2
    // small slack: a fixture doc hash-colliding into the planted bucket
    // lengthens the chain by one
    assert(capped - base <= 205,
      s"capped corpus added ${capped - base} candidates over the base " +
        s"$base — expected the ~199-edge chain, not the $clique-pair clique")
  }

  test("measured shuffle bytes: partial aggregation shrinks the exchange to group scale") {
    // lineitem is ~6k rows at this SF; after map-side partial aggregation
    // the exchange carries (groups × partitions) rows — a few KB, orders
    // of magnitude under the input.
    val shuffled = shuffleDataSize(q("q_agg_group"))
    assert(shuffled > 0, "expected an executed shuffle for the group-by")
    assert(shuffled < 64 * 1024,
      s"partial aggregation should bound the exchange, got $shuffled bytes")
  }
}

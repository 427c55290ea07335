package graft

import java.nio.file.Files

import graft.operators.TpchGatedQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The 7 fixture-gated TPC-H queries (Q2/Q9/Q11/Q12/Q16/Q20/Q21) against
  * a synthetic EXTENDED fixture built in-test: the driver fixtures lack
  * partsupp and lineitem's shipmode/commitdate/receiptdate, so this spec
  * derives them deterministically from the real tables, then proves each
  * DataFrame body row-identical to its oracle SQL — executed by Spark SQL
  * itself over the same files (same ANSI semantics DuckDB will apply when
  * the driver extends the fixtures and Verify's gate flips on).
  */
class TpchGatedSpec extends SparkSpec {

  /** Extended-fixture dir: base tables + partsupp + extended lineitem.
    * Supplier nationkeys are rewritten round-robin over the query
    * parameters' nations (the fixture's own distribution never lands on
    * GERMANY/CANADA/SAUDI ARABIA, which would make Q11/Q20/Q21 vacuous
    * empty-vs-empty checks); part names plant a deterministic forest%
    * subset for Q20. */
  private lazy val extDir: String = {
    val dir = Files.createTempDirectory("graft-tpch-ext").toString
    for (t <- Seq("region", "nation", "customer", "orders"))
      table(t).write.mode("overwrite").parquet(s"$dir/$t.parquet")

    // the queries' parameter nations (NATION_7/3/20) plus three nations in
    // the EUROPE region (regionkey 3 → NATION_8/13/18) so Q2 has min-cost
    // suppliers to find
    val nationKeys = table("nation")
      .filter(col("n_name").isin("NATION_7", "NATION_3", "NATION_20",
        "NATION_8", "NATION_13", "NATION_18"))
      .orderBy("n_name")
      .select(col("n_nationkey").cast("long").as("nk"))
      .collect().map(_.getAs[Long]("nk"))
    assert(nationKeys.length == 6, s"nation fixture missing names: ${nationKeys.toSeq}")
    table("supplier")
      .withColumn("s_nationkey", element_at(
        typedlit(nationKeys.toSeq),
        (pmod(col("s_suppkey"), lit(nationKeys.length)) + 1).cast("int")))
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")

    table("part")
      .withColumn("p_name",
        when(pmod(col("p_partkey"), lit(20)) === 0,
          concat(lit("forest "), col("p_name"))).otherwise(col("p_name")))
      .write.mode("overwrite").parquet(s"$dir/part.parquet")

    table("lineitem")
      .withColumn("l_shipmode", element_at(
        typedlit(Seq("MAIL", "SHIP", "AIR", "TRUCK", "RAIL")),
        (pmod(col("l_orderkey") + col("l_linenumber"), lit(5)) + 1).cast("int")))
      .withColumn("l_commitdate", expr(
        "timestampadd(DAY, CAST(pmod(xxhash64(l_orderkey, l_linenumber), 30) AS INT) - 10, l_shipdate)"))
      .withColumn("l_receiptdate", expr(
        "timestampadd(DAY, CAST(pmod(xxhash64(l_linenumber, l_orderkey), 20) AS INT) - 5, l_commitdate)"))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")

    val nSupp = table("supplier").count()
    val minSupp = table("supplier")
      .agg(min(col("s_suppkey").cast("long"))).head().getLong(0)
    table("part").select("p_partkey")
      .withColumn("i", explode(typedlit(Seq(0, 1))))
      .select(col("p_partkey").as("ps_partkey"),
        (pmod(col("p_partkey") * 7 + col("i") * 13, lit(nSupp)) + minSupp)
          .as("ps_suppkey"),
        (pmod(col("p_partkey") * 17 + col("i"), lit(1000)) + 1).cast("int")
          .as("ps_availqty"),
        (pmod(col("p_partkey") * 31 + col("i") * 97, lit(100000))
          .cast("double") / 100.0).as("ps_supplycost"))
      .write.mode("overwrite").parquet(s"$dir/partsupp.parquet")

    for (t <- Seq("part", "supplier", "partsupp", "nation", "region",
        "lineitem", "orders"))
      spark.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(t)
    dir
  }

  test("gate: extended dir detected, driver fixtures correctly excluded") {
    assert(TpchGatedQueries.supported(spark, extDir))
    assert(!TpchGatedQueries.supported(spark, sf),
      "driver fixtures lack partsupp — the gate must stay closed")
  }

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  for (name <- TpchGatedQueries.queries.keys.toSeq.sorted) {
    test(s"$name: DataFrame body equals its oracle SQL on the extended fixture") {
      extDir // force fixture build + view registration
      val body = rows(TpchGatedQueries.queries(name)(spark, extDir))
      val oracle = rows(spark.sql(TpchGatedQueries.oracleSql(name)))
      assert(body == oracle,
        s"$name diverged: body ${body.take(3)}... (${body.length} rows) vs " +
          s"oracle ${oracle.take(3)}... (${oracle.length} rows)")
    }
  }

  test("plan lint: no cartesian; BNLJ only with a provably single-row side") {
    // the PlanLintSpec contract extended to the gated registry (it only
    // walks SparkEntry.queries): no CartesianProduct anywhere; a
    // BroadcastNestedLoopJoin is legal only when one side is a global
    // aggregate (Q11's one-row 0.0001-threshold broadcast), never a
    // data-sized relation
    extDir
    for (name <- TpchGatedQueries.queries.keys.toSeq.sorted) {
      val df = TpchGatedQueries.queries(name)(spark, extDir)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(!plan.contains("CartesianProduct"),
        s"$name planned a cartesian:\n$plan")
      if (plan.contains("BroadcastNestedLoopJoin"))
        assert(name == "q_tpch_q11" && plan.contains("Aggregate"),
          s"$name has an unexpected BNLJ:\n$plan")
    }
  }

  test("parameter coverage: the planted fixture keeps the queries non-vacuous") {
    extDir
    for (name <- Seq("q_tpch_q9", "q_tpch_q11", "q_tpch_q12", "q_tpch_q16",
        "q_tpch_q21")) {
      val n = TpchGatedQueries.queries(name)(spark, extDir).count()
      assert(n > 0, s"$name returned no rows — parameters miss the fixture")
    }
  }
}

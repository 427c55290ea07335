package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The round-13 RangeRank generalization (grouped two-phase ranks,
  * running sums, the integer NTILE formula) and the plan contracts of
  * the three queries ported onto it — q_rfm, q_hist_equidepth,
  * q_pareto_8020 were the registry's last corpus-proportional
  * single-task window plans (round-12 verdict finding #1).
  */
class RangeRankSpec extends SparkSpec {

  private def run(name: String, dir: String) =
    SparkEntry.queries(name)(spark, dir)

  /** Every WindowExec in the executed plan must be scale-safe: either
    * its PARTITION BY references RangeRank's `__rr_bkt` (per-bucket,
    * parallel by construction), or it consumes an aggregate's output
    * (bounded rows — RangeRank's numPartitions-sized offsets pass).
    * This is STRONGER than PlanDoctor's global-window rule, which
    * cannot see that a flag-partitioned window over fact grain funnels
    * a third of the corpus through one task. */
  private def assertWindowsScaleSafe(name: String,
                                     df: org.apache.spark.sql.DataFrame): Unit = {
    df.collect()
    def resolve(p: SparkPlan): Seq[SparkPlan] = (p match {
      case a: AdaptiveSparkPlanExec => resolve(a.executedPlan)
      case q: QueryStageExec => resolve(q.plan)
      case other => other.children.flatMap(resolve)
    }) :+ p
    def hasAggBelow(p: SparkPlan): Boolean =
      resolve(p).exists(_.isInstanceOf[BaseAggregateExec])
    val qe = df.queryExecution.executedPlan
    val windows = resolve(qe).collect { case w: WindowExec => w }
    assert(windows.nonEmpty || name == "q_pareto_8020",
      s"$name: expected the per-range windows in the executed plan")
    windows.foreach { w =>
      val pidKeyed = w.partitionSpec.exists(
        _.references.exists(_.name.startsWith("__rr_bkt")))
      assert(pidKeyed || hasAggBelow(w.child),
        s"$name has a corpus-grain window NOT keyed on __rr_bkt: " +
          s"partitionSpec=${w.partitionSpec.mkString(",")}")
    }
    val risks = graft.plans.PlanDoctor.diagnoseExecuted(df)
      .filter(f => f.severity == "risk" && f.rule == "global-window")
    assert(risks.isEmpty, risks.map(_.render).mkString("; "))
  }

  test("q_rfm executed plan: no single-partition or entity-grain window") {
    assertWindowsScaleSafe("q_rfm", run("q_rfm", sf))
  }

  test("q_hist_equidepth executed plan: windows keyed on __rr_bkt") {
    assertWindowsScaleSafe("q_hist_equidepth", run("q_hist_equidepth", sf))
  }

  test("q_pareto_8020 executed plan: no single-partition window") {
    assertWindowsScaleSafe("q_pareto_8020", run("q_pareto_8020", sf))
  }

  test("withGroupedRank == per-group window rank; running sums exact") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // 3 skewed groups, duplicate sort keys to force the tiebreak
    val df = Seq.tabulate(6000) { i =>
      (if (i % 7 == 0) "a" else if (i % 3 == 0) "b" else "c",
        rnd.nextInt(200).toLong, rnd.nextInt(1000).toLong, i.toLong)
    }.toDF("g", "k", "v", "id")
    val two = graft.functions.RangeRank
      .withGroupedRank(df, Seq("g"), Seq(col("k"), col("id")), "r",
        sumCols = Seq("v" -> "cum"), partitions = 7)
      .select("id", "r", "cum").as[(Long, Long, Long)]
      .collect().map(t => t._1 -> ((t._2, t._3))).toMap
    val w = Window.partitionBy("g").orderBy(col("k"), col("id"))
    val one = df
      .withColumn("r", row_number().over(w).cast("long"))
      .withColumn("cum", sum(col("v")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("id", "r", "cum").as[(Long, Long, Long)]
      .collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(two == one,
      "grouped two-phase rank+prefix-sum must equal the window twins")
  }

  test("countName + desc order match the window twins") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val df = Seq.tabulate(3000) { i =>
      (if (i % 5 == 0) "x" else "y", rnd.nextInt(40).toLong, i.toLong)
    }.toDF("g", "k", "id")
    val two = graft.functions.RangeRank
      .withGroupedRank(df, Seq("g"), Seq(col("k").desc, col("id")), "r",
        countName = "n", partitions = 5)
      .select("id", "r", "n").as[(Long, Long, Long)]
      .collect().map(t => t._1 -> ((t._2, t._3))).toMap
    val w = Window.partitionBy("g").orderBy(col("k").desc, col("id"))
    val one = df
      .withColumn("r", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("g")))
      .select("id", "r", "n").as[(Long, Long, Long)]
      .collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(two == one, "desc rank + group count must equal the window twins")
  }

  test("NaN double keys rank like Spark's NaN-greatest sort order") {
    import spark.implicits._
    // NaN sorts GREATER than every double (incl. Infinity) in Spark; the
    // r13 BucketIndex binary search compared raw doubles, which would
    // have dropped NaN into bucket 0 under asc (every `<` is false) and
    // the LAST bucket under desc — both opposite to the sort order. The
    // fix maps a NaN key to +Infinity before the search (same bucket as
    // Infinity keys; the in-bucket window then orders them exactly).
    val vals = Seq(Double.NaN, 1.0, Double.PositiveInfinity, -3.5,
      Double.NaN, 0.0, Double.NegativeInfinity, 2.5, 97.0, -1.25)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "k")
    for (desc <- Seq(false, true)) {
      val sort = if (desc) Seq(col("k").desc, col("id")) else Seq(col("k"), col("id"))
      val two = graft.functions.RangeRank
        .withRank(df, sort, "r", partitions = 4)
        .select("id", "r").as[(Long, Long)].collect().toMap
      val one = df.withColumn("r",
          row_number().over(Window.orderBy(sort: _*)).cast("long"))
        .select("id", "r").as[(Long, Long)].collect().toMap
      assert(two == one, s"NaN ranks diverge from the window (desc=$desc)")
    }
  }

  test("ntileFromRank matches window NTILE across n/k boundary cases") {
    import spark.implicits._
    // n = 1..25 over k in {4, 8}: covers n < k, n = k, n % k = 0, and
    // every uneven-bucket split
    for (k <- Seq(4, 8); n <- Seq(1, 3, 7, 8, 25, 32, 100)) {
      val df = (1L to n.toLong).map(i => (i, i * 37 % 11)).toDF("id", "k0")
      val ranked = graft.functions.RangeRank.withGroupCount(
        graft.functions.RangeRank.withRank(df,
          Seq(col("k0"), col("id")), "r", partitions = 3),
        Nil, "n")
        .withColumn("b", graft.functions.RangeRank
          .ntileFromRank(col("r"), col("n"), k).cast("int"))
        .select("id", "b").as[(Long, Int)].collect().toMap
      val win = df.withColumn("b",
          ntile(k).over(Window.orderBy(col("k0"), col("id"))))
        .select("id", "b").as[(Long, Int)].collect().toMap
      assert(ranked == win, s"NTILE($k) mismatch at n=$n")
    }
  }
}

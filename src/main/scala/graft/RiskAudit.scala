package graft

import org.apache.spark.sql.SparkSession

/** Per-query PlanDoctor audit over the registry — the drill-down behind
  * Bench's planRisks/planRisksNovel counters: prints every risk finding
  * with its rule and allowlist status, on the EXECUTED adaptive plan
  * (the same flavor Bench counts). Args: [sfDir] [queryName ...];
  * defaults to sf0.01 and the full registry.
  */
object RiskAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val only = args.drop(1).toSet
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var raw = 0; var novel = 0
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only.contains(n) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, dir)
          val findings = graft.plans.PlanDoctor.diagnoseExecuted(df)
            .filter(_.severity == "risk")
          val plan = df.queryExecution.executedPlan
          val nv = graft.plans.PlanAllowlist.filterNovel(name, findings, plan)
          raw += findings.size; novel += nv.size
          findings.foreach { f =>
            val tag = if (nv.contains(f)) "NOVEL" else "allowlisted"
            println(s"$tag $name: ${f.render}")
          }
        } catch { case e: Throwable =>
          println(s"ERR $name ${Option(e.getMessage).getOrElse(e.getClass.getName).take(120)}")
        }
      }
    println(s"[riskaudit] raw=$raw novel=$novel")
    spark.stop()
  }
}

package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dev utility: dump `.explain("formatted")` of registry queries to files.
  * Test-sources-only (must not ship in the production artifact); run with
  * BOTH target/scala-2.13/classes and target/scala-2.13/test-classes
  * (plus the Spark jars) on the classpath:
  *   java -cp "<classes>:<test-classes>:<spark jars>" graft.ExplainQuery
  *     <outDir> <suffix> <sfDir> <query ...>
  * Writes <outDir>/<query>_<suffix>.txt per query. The plan is the
  * EXECUTED adaptive plan (the df is run first via toRdd.count, so AQE's
  * final join strategies / coalesced exchanges are what lands in the file
  * — the same flavor Bench's plan audit grades).
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val sfDir = args(2)
    val names = args.drop(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    plans.TopKPerGroup.install(spark) // match Bench/Verify session wiring
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        // run it so the adaptive plan is final, then capture both views
        df.queryExecution.toRdd.count()
        val formatted = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val executed = df.queryExecution.executedPlan.toString
        Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"),
          s"== explain(formatted) ==\n$formatted\n== executedPlan (final adaptive) ==\n$executed\n")
        println(s"[explain] wrote $name")
      } catch { case e: Throwable =>
        println(s"[explain] ERR $name ${Option(e.getMessage).getOrElse(e.getClass.getName).take(160)}")
      }
    }
    spark.stop()
  }
}

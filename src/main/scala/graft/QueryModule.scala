package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A bundle of oracle-checked queries contributed to [[SparkEntry]].
  *
  * Contract (see SURVEY.md §2.3): every key in [[queries]] that also appears
  * in [[oracleSql]] is hash-compared by the driver against DuckDB running the
  * oracle SQL over the same parquet tables. Determinism rules:
  *   - total ORDER BY on a unique key in BOTH formulations;
  *   - ROUND(x, 4) on every floating-point output in BOTH;
  *   - identical column names on both sides (driver sorts columns by name).
  */
trait QueryModule {
  /** (spark, sfDir) => result. sfDir holds `<table>.parquet` files. */
  type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q]

  def oracleSql: Map[String, String]

  /** Load one fixture table from the scale-factor directory. */
  protected def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")
}

/** Central fixture-table loader (TESTDATA.md / FIXTURES.md §B). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register every fixture as a temp view so modules can use spark.sql. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n => load(spark, sfDir, n).createOrReplaceTempView(n) }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM-wide session — Spark's
  * getOrCreate makes this safe across suites and keeps test startup O(1)).
  * Mirrors the Verify/Bench session config exactly.
  */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  /** Smallest fixture — specs verify exact semantics here; the driver's
    * DuckDB oracle covers sf0.01. */
  val sf: String = "/root/testdata/sf0.001"
}

abstract class SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf: String = SparkTestSession.sf

  def q(name: String): DataFrame = SparkEntry.queries(name)(spark, sf)

  def table(name: String): DataFrame = Tables.load(spark, sf, name)
}

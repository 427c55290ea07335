package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Tables.load's events-timestamp adaptation: the fixture's parquet
  * physical type changed once already between rounds (TIMESTAMP(NANOS) →
  * TIMESTAMP(MICROS) NTZ) and darkened a third of the registry. This spec
  * pins all three loader branches against synthetic events tables, so a
  * future regeneration to ANY of the shapes is caught by a unit test
  * instead of a driver-gate blackout.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  // one real µs instant: 2024-03-05 12:30:45.123456 UTC
  private val micros = 1709641845123456L

  private def loadEvents(dir: String) = Tables.load(spark, dir, "events")

  private def writeAndLoad(write: String => Unit) = {
    val dir = Files.createTempDirectory("graft-tables").toString
    write(dir)
    loadEvents(dir)
  }

  test("legacy ns-long fixture: BIGINT epoch-nanos arrives as µs timestamp") {
    // what nanosAsLong=true yields on a TIMESTAMP(NANOS) parquet: a plain
    // long column of epoch-nanos (here written directly as BIGINT, which
    // exercises the same loader branch)
    val df = writeAndLoad { dir =>
      Seq((1L, micros * 1000L + 789L)) // sub-µs nanos must truncate away
        .toDF("event_id", "ts")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
    }
    assert(df.schema("ts").dataType == TimestampType)
    val got = df.select(unix_micros(col("ts"))).head().getLong(0)
    assert(got == micros, s"expected $micros, got $got")
  }

  test("current µs-NTZ fixture shape loads as TimestampType, value-exact") {
    // Spark writes TIMESTAMP_NTZ parquet for a TimestampNTZType column —
    // byte-identical physical type to the regenerated fixtures
    val df = writeAndLoad { dir =>
      Seq(Tuple1(1L)).toDF("event_id")
        .withColumn("ts", timestamp_micros(lit(micros)).cast("timestamp_ntz"))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
    }
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.select(unix_micros(col("ts"))).head().getLong(0) == micros)
  }

  test("UTC-adjusted µs fixture passes through unchanged") {
    val df = writeAndLoad { dir =>
      Seq(Tuple1(1L)).toDF("event_id")
        .withColumn("ts", timestamp_micros(lit(micros)))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
    }
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.select(unix_micros(col("ts"))).head().getLong(0) == micros)
  }

  test("real fixture loads events.ts as TimestampType (whatever its parquet type)") {
    val df = Tables.load(spark, sf, "events")
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.filter(col("ts").isNotNull).count() > 0)
  }

  test("non-events tables are untouched by the ts adaptation") {
    // orders carries a timestamp column too; the loader must not rewrite it
    val viaLoad = Tables.load(spark, sf, "orders")
    val direct = spark.read.parquet(s"$sf/orders.parquet")
    assert(viaLoad.schema == direct.schema)
    assert(viaLoad.count() == direct.count())
  }

  test("ts adaptation survives a LongType column that is NOT nanos-scaled name clash") {
    // a table named anything but events keeps a plain BIGINT ts column
    val dir = Files.createTempDirectory("graft-tables").toString
    Seq((1L, 42L)).toDF("id", "ts")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val df = Tables.load(spark, dir, "documents")
    assert(df.schema("ts").dataType == LongType)
    assert(df.head().getLong(1) == 42L)
  }
}

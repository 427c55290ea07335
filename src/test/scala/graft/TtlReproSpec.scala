package graft

import java.nio.file.Files
import java.time.Duration

import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration._

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Standalone StatefulProcessor so the closure doesn't capture the spec. */
class TtlCountProc(ttlMs: Long)
    extends StatefulProcessor[String, String, (String, Long)] {
  @transient private var v: ValueState[Long] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    v = getHandle.getValueState[Long]("v", Encoders.scalaLong,
      if (ttlMs > 0) TTLConfig(Duration.ofMillis(ttlMs)) else TTLConfig.NONE)
  override def handleInputRows(key: String, rows: Iterator[String],
      timerValues: TimerValues): Iterator[(String, Long)] = {
    val n = (if (v.exists()) v.get() else 0L) + rows.size
    v.update(n)
    Iterator((key, n))
  }
}

/** Documents the round-2 TTL finding: with TTLConfig + ProcessingTime,
  * `processAllAvailable` NEVER quiesces (the engine keeps scheduling
  * batches for TTL bookkeeping) — yet every data batch completes and the
  * results are correct. The takeaway is a harness rule, not a bug in the
  * operator: TTL'd queries must be waited on by polling the sink
  * (StreamingSpec's TTL tests do), never by processAllAvailable. */
class TtlReproSpec extends SparkSpec {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("repro: TTLConfig + ProcessingTime, does processAllAvailable quiesce?") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[String]
      val cp = Files.createTempDirectory("ttl-cp").toString
      val q = in.toDS.groupByKey(identity)
        .transformWithState(new TtlCountProc(500),
          TimeMode.ProcessingTime(), OutputMode.Update())
        .toDF("key", "count")
        .writeStream.format("memory").queryName("ttl_repro1")
        .outputMode("update").option("checkpointLocation", cp).start()
      try {
        in.addData("a", "a", "b")
        val f = Future { q.processAllAvailable() }
        val quiesced = try { Await.result(f, 10.seconds); true }
          catch { case _: concurrent.TimeoutException => false }
        info(s"query 1 processAllAvailable quiesced=$quiesced")
        val rows = spark.table("ttl_repro1").as[(String, Long)].collect().toMap
        info(s"query 1 rows=$rows")
        // the guarantee that makes TTL shippable: data IS processed
        assert(rows == Map("a" -> 2L, "b" -> 1L), s"rows $rows")
      } finally q.stop()
      // second query in the same suite — the round-2 hang signature
      val in2 = MemoryStream[String]
      val cp2 = Files.createTempDirectory("ttl-cp").toString
      val q2 = in2.toDS.groupByKey(identity)
        .transformWithState(new TtlCountProc(500),
          TimeMode.ProcessingTime(), OutputMode.Update())
        .toDF("key", "count")
        .writeStream.format("memory").queryName("ttl_repro2")
        .outputMode("update").option("checkpointLocation", cp2).start()
      try {
        in2.addData("x")
        val f2 = Future { q2.processAllAvailable() }
        val quiesced2 = try { Await.result(f2, 10.seconds); true }
          catch { case _: concurrent.TimeoutException => false }
        info(s"query 2 processAllAvailable quiesced=$quiesced2")
      } finally q2.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.MinHashDedup

/** Dev utility: measures what incremental dedup buys over a full
  * re-dedup when a small batch lands on a standing corpus — the daily
  * operation of a living training corpus. Splits the documents table by
  * doc_id hash into a standing corpus (~(split-1)/split) and a batch
  * (~1/split), then times:
  *   1. full   — dedup(existing ∪ batch): re-pairs the WHOLE corpus,
  *               the existing×existing quadrant dominates;
  *   2. incr   — dedupIncremental(existing, batch): the corpus only
  *               contributes banded keys to a key-equality join against
  *               the batch — existing×existing is structurally absent.
  * Also cross-checks the invariant: the batch rows kept by the two paths
  * agree (modulo the documented hot-bucket cross-chain difference, which
  * is zero on these fixtures).
  *
  * Usage: runMain graft.IncrBench [sfDir] [split] [threshold] [reps]
  */
object IncrBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/graft-sf1"
    val split = if (args.length > 1) args(1).toInt else 10
    val threshold = if (args.length > 2) args(2).toDouble else 0.5
    val reps = if (args.length > 3) args(3).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val isBatch = pmod(xxhash64(col("doc_id")), lit(split)) === 0
    val existing = docs.filter(!isBatch).localCheckpoint(true)
    val batch = docs.filter(isBatch).localCheckpoint(true)
    println(s"[incrbench] corpus=${existing.count()} batch=${batch.count()} " +
      s"threshold=$threshold")

    def timeMedian(label: String)(run: () => Long): Unit = {
      run() // warm
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val rows = run()
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      val med = times.map(_._1).sorted.apply(reps / 2)
      println(f"[incrbench] $label%-10s median $med%.3f s  kept=${times.head._2}")
    }

    timeMedian("full")(() =>
      MinHashDedup.dedup(existing.unionAll(batch), "doc_id", "text", threshold)
        // count only the batch rows the full path keeps, so the two
        // paths' kept counts are comparable
        .join(batch.select("doc_id"), Seq("doc_id"), "left_semi").count())

    // the one-time corpus index build (amortized across every future
    // increment; localCheckpoint stands in for the persisted tables)
    val t0 = System.nanoTime()
    val raw = MinHashDedup.buildIndex(existing, "doc_id", "text")
    val index = MinHashDedup.Index(
      raw.keys.localCheckpoint(true), raw.shingles.localCheckpoint(true))
    println(f"[incrbench] index-build ${(System.nanoTime() - t0) / 1e9}%.3f s " +
      s"(one-time; keys=${index.keys.count()} shingleRows=${index.shingles.count()})")

    timeMedian("incr")(() =>
      MinHashDedup.dedupIncremental(index, batch, "doc_id", "text",
        threshold).count())

    // invariant check (full keeps a batch doc iff incr does, EXCEPT when
    // the full path's min-id survivor of a duplicate group sits in the
    // batch — then full keeps the batch doc and drops the existing one,
    // while incr defers to the standing corpus; report both sets)
    val fullKept = MinHashDedup
      .dedup(existing.unionAll(batch), "doc_id", "text", threshold)
      .join(batch.select("doc_id"), Seq("doc_id"), "left_semi")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val incrKept = MinHashDedup
      .dedupIncremental(index, batch, "doc_id", "text", threshold)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    println(s"[incrbench] kept full=${fullKept.size} incr=${incrKept.size} " +
      s"onlyFull=${(fullKept -- incrKept).size} onlyIncr=${(incrKept -- fullKept).size}")

    // —— 5 successive increments with index APPEND (round-8 task #3):
    // each step dedups its batch against the CURRENT index, then
    // updateIndex-appends the kept rows — no corpus rebuild anywhere.
    // Per-step time should stay ~flat: the work scales with the batch
    // (plus the key-join against an index that grows only by batches).
    val nInc = 5
    val mod = pmod(xxhash64(col("doc_id")), lit(2 * nInc))
    val base = docs.filter(mod >= nInc).localCheckpoint(true)
    val t1 = System.nanoTime()
    val raw2 = MinHashDedup.buildIndex(base, "doc_id", "text")
    var idx = MinHashDedup.Index(
      raw2.keys.localCheckpoint(true), raw2.shingles.localCheckpoint(true))
    println(f"[incrbench] inc-base build ${(System.nanoTime() - t1) / 1e9}%.3f s " +
      s"(corpus=${base.count()})")
    (0 until nInc).foreach { i =>
      val b = docs.filter(mod === i).localCheckpoint(true)
      val t = System.nanoTime()
      val kept = MinHashDedup
        .dedupIncremental(idx, b, "doc_id", "text", threshold)
        .localCheckpoint(true)
      val updated = MinHashDedup.updateIndex(idx, kept, "doc_id", "text")
      idx = MinHashDedup.Index(updated.keys.localCheckpoint(true),
        updated.shingles.localCheckpoint(true))
      println(f"[incrbench] inc${i + 1} ${(System.nanoTime() - t) / 1e9}%.3f s " +
        s"batch=${b.count()} kept=${kept.count()} keys=${idx.keys.count()}")
    }
    spark.stop()
  }
}

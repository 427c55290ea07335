package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming twin of the batch decontamination gate
  * (`operators/PipelineQueries.q_decontaminate` / `contaminatedBloom`):
  * documents ARRIVE (a crawl, an ingest topic) and must be checked
  * against a FIXED eval set before they can enter a training corpus —
  * the production shape of decontamination, where the eval set is known
  * up front and the train side is unbounded.
  *
  * Plan shape — deliberately STATELESS: the eval side collapses to its
  * distinct 5-gram set once (bounded: eval sets are tiny by contract,
  * the same bound `contaminatedBloom` documents) and broadcasts; each
  * arriving doc builds its own distinct 5-grams and counts hits against
  * the broadcast IN THE ROW. A doc's verdict depends only on the doc and
  * the static set, so the natural join-then-regroup formulation would
  * pay a per-doc streaming AGGREGATE whose state grows with every doc
  * ever seen — unbounded state for a stateless question. Here there is
  * no state at all: append mode, restart = replay offsets, exactly-once
  * for free.
  *
  * Batch parity (StreamingSpec): over the fixture's train docs as a
  * MemoryStream, the per-doc hit counts equal q_decontaminate's batch
  * answer row-for-row (same gram rule, same per-doc distinct).
  *
  * 100 TB lens: per-batch work is one scan-side pass (tokenize + gram
  * hash-set probe), embarrassingly parallel; the broadcast is
  * eval-sized (KBs–MBs) and independent of stream length. At an eval
  * set too large to broadcast exactly, pre-screen with a Bloom filter
  * and route probables through a batch-side exact join
  * (contaminatedBloom's shape) — the verdict stays exact either way.
  */
object StreamingDecontaminate {

  case class Doc(doc_id: Long, text: String)
  case class Contamination(doc_id: Long, n_hit_grams: Long)

  /** Per-doc distinct 5-gram relation (doc_id, g) — THE batch gram rule,
    * shared with q_decontaminate (one DataFrame-side implementation). */
  private[streaming] def grams(docs: DataFrame): DataFrame =
    graft.operators.PipelineQueries.fiveGrams(docs)

  /** The doc's distinct 5-grams, driver-side twin of [[grams]] — used by
    * the per-row counter so stream and batch share one gram rule. */
  private[streaming] def docGrams(text: String): Set[String] = {
    val t = text.split(" ", -1)
    if (t.length < 5) Set.empty
    else (0 to t.length - 5).map(i => t.slice(i, i + 5).mkString(" ")).toSet
  }

  /** Streaming per-doc contamination counts (append mode, ZERO state):
    * one row per arriving doc sharing ≥ 1 distinct 5-gram with
    * `evalDocs` (a batch relation (doc_id, text) — the fixed eval set). */
  def contaminationCounts(spark: SparkSession, stream: Dataset[Doc],
                          evalDocs: DataFrame): Dataset[Contamination] = {
    import spark.implicits._
    val evSet = grams(evalDocs).select("g").distinct()
      .collect().map(_.getString(0)).toSet // bounded: eval sets are tiny
    val bc = spark.sparkContext.broadcast(evSet)
    stream.map { d =>
      Contamination(d.doc_id, docGrams(d.text).count(bc.value.contains).toLong)
    }.filter(_.n_hit_grams > 0)
  }
}

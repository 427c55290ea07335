package graft.streaming

import graft.functions.MinHashDedup
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming MinHash-LSH near-dup candidates: the cross-batch version of
  * MinHashDedup.candidatePairs. A per-batch self-join only sees pairs
  * that arrive in the SAME micro-batch; here each band bucket keeps its
  * member ids in keyed state, so a new document pairs against every
  * earlier member regardless of arrival batch — the property a streaming
  * dedup pipeline actually needs.
  *
  * Scale notes: state is partitioned by band-bucket hash (uniform by
  * construction); each bucket holds ≤ maxBucket ids — overflow keeps the
  * NEWEST members and evicts the oldest (recency-biased recall: bounded
  * memory traded for pairs against the distant past, the standard
  * streaming-LSH compromise). The banding math runs as ordinary
  * codegen'd column expressions BEFORE the stateful shuffle; the same
  * pair surfacing via two bands is emitted twice — downstream verify
  * dedups, exactly as in the batch path.
  */
object StreamingLsh {

  case class BandDoc(bucket: Long, docId: Long)
  case class CandidatePair(idA: Long, idB: Long)

  /** docs must have columns (doc_id: Long, text: String); may be a
    * streaming DataFrame.
    *
    * `stateTtlMs > 0` puts a processing-time TTL on each band bucket:
    * a bucket that sees no members for that long is evicted wholesale
    * (fMGWS ProcessingTimeTimeout + state.remove), so a long-running
    * job's state tracks the RECENTLY-ACTIVE bucket set instead of
    * growing with all-time bucket cardinality. The trade is explicit:
    * a new document no longer pairs against members older than the TTL
    * — recency-bounded recall, the same compromise maxBucket already
    * makes spatially, applied temporally. fMGWS fires expired timers
    * when a micro-batch runs, so eviction happens on the next batch
    * after the idle period. */
  def candidates(spark: SparkSession, docs: DataFrame,
                 shingleN: Int = 2, bands: Int = 4, rows: Int = 4,
                 maxBucket: Int = 64,
                 stateTtlMs: Long = 0L): Dataset[CandidatePair] = {
    import spark.implicits._
    val k = bands * rows
    val sig = docs.select(col("doc_id"),
        MinHashDedup.shingles(col("text"), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), MinHashDedup.signature(col("sh"), k).as("sig"))
    // bucket = the SHARED band-key hash (MinHashDedup.bandKeyStructs —
    // band index mixed in keeps different bands' buckets disjoint);
    // band_hash alone is the bucket id here since the index is in the hash
    val banded = sig.select(
        explode(transform(
          MinHashDedup.bandKeyStructs(col("sig"), bands, rows),
          bk => bk.getField("band_hash"))).as("bucket"),
        col("doc_id").as("docId"))
      .as[BandDoc]
    val timeout =
      if (stateTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    banded.groupByKey(_.bucket)
      .flatMapGroupsWithState[List[Long], CandidatePair](
        OutputMode.Append(), timeout) {
        (_, it, state) =>
          if (stateTtlMs > 0 && state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val retained = state.getOption.getOrElse(Nil)
            val incoming = it.map(_.docId).toList.distinct
              .filterNot(retained.contains)
            val out = List.newBuilder[CandidatePair]
            var seen = retained
            incoming.foreach { id =>
              seen.foreach { p =>
                out += CandidatePair(math.min(id, p), math.max(id, p))
              }
              seen = id :: seen
            }
            state.update(seen.take(maxBucket))
            if (stateTtlMs > 0) state.setTimeoutDuration(stateTtlMs)
            out.result().iterator
          }
      }
  }

  /** Streaming arrivals verified against the STANDING corpus — the
    * continuous twin of `MinHashDedup.dedupIncremental`: each incoming
    * document's banded keys stream-static-join the corpus
    * [[MinHashDedup.Index]] (`keys` equi-join, then `shingles` for the
    * exact-Jaccard verify), emitting (doc_id, matched_id, jaccard) hits.
    * The corpus index is a static relation, so Spark plans a plain
    * stream-static join — no state store grows with the corpus, and at
    * scale the static side is the same persisted, bucket-partitioned
    * index table the batch increment reads. Within-stream duplicates are
    * [[candidates]]' job; compose both for full continuous dedup.
    *
    * A pair colliding in several bands emits once per colliding band
    * (identical rows) — the [[candidates]] multiplicity convention:
    * streaming-side dedup would need a state store, and downstream
    * consumers treat hits as a set. docs must carry (doc_id: Long,
    * text: String); may be streaming. */
  def againstIndex(spark: SparkSession, docs: DataFrame,
                   index: MinHashDedup.Index, threshold: Double,
                   shingleN: Int = 2, bands: Int = 4,
                   rows: Int = 4): DataFrame = {
    graft.functions.NativeJaccard.register(spark)
    val k = bands * rows
    val keyed = docs.select(col("doc_id"),
        MinHashDedup.shingles(col("text"), shingleN).as("sb_sh"))
      .filter(size(col("sb_sh")) > 0)
      .select(col("doc_id"), col("sb_sh"),
        MinHashDedup.signature(col("sb_sh"), k).as("sig"))
      .select(col("doc_id"), col("sb_sh"),
        explode(MinHashDedup.bandKeyStructs(col("sig"), bands, rows))
          .as("bk"))
      .select(col("doc_id"), col("sb_sh"),
        col("bk.band_idx").as("band_idx"), col("bk.band_hash").as("band_hash"))
    val jac = call_function(graft.functions.NativeJaccard.name,
      col("sb_sh"), col("se.sh"))
    keyed
      .join(index.keys.alias("e"), Seq("band_idx", "band_hash"))
      // a replayed document already present in the index (at-least-once
      // delivery) would otherwise match ITSELF at jaccard 1.0 and be
      // dropped as "a duplicate of the corpus"
      .filter(col("doc_id") =!= col("e.mh_id"))
      .select(col("doc_id"), col("sb_sh"), col("e.mh_id").as("matched_id"))
      .join(index.shingles.alias("se"), col("matched_id") === col("se.sh_id"))
      .select(col("doc_id"), col("matched_id"), jac.as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}

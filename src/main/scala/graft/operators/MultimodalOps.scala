package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column carriage (north-star extension: image/audio/video as
  * opaque binary columns with typed metadata).
  *
  * Layout contract for 100 TB media tables:
  *   - `media: binary` — the heavy payload, ONE column, so Parquet column
  *     pruning skips it entirely for metadata-only queries;
  *   - metadata lives in ordinary top-level columns (`format`, `width`,
  *     `height`, `n_bytes`) — NOT packed inside the binary and NOT in a
  *     single opaque struct blob — so predicate pushdown ("width > 512")
  *     prunes row groups without touching payload bytes;
  *   - partition by a content-hash bucket of the id, never by raw file
  *     path (hot-spot avoidance when one crawl dominates).
  *
  * Decode is STUBBED (no image/audio codecs in this environment): the
  * `???`-equivalent is [[FakeCodec]], a deterministic byte-level parser
  * that stands in for a JNI/library decoder. The Spark-side plumbing —
  * schema, mapPartitions batch shape, per-partition codec init — is real
  * and is the part a production codec would drop into.
  */
object MultimodalOps {

  case class MediaRecord(id: Long, media: Array[Byte], format: String)

  case class DecodedMeta(id: Long, format: String, width: Int, height: Int,
                         n_bytes: Long, valid: Boolean)

  /** STUB decoder: deterministic fake standing in for a real codec
    * (e.g. libjpeg via JNI). Derives "dimensions" from payload bytes so
    * tests are stable; a real implementation replaces ONLY this object. */
  object FakeCodec {
    /** Per-partition "codec handle" — real codecs are expensive to init,
      * so the contract is one init per partition, not per row. */
    def open(): FakeCodec = new FakeCodec
  }
  final class FakeCodec {
    def decodeMeta(payload: Array[Byte]): (Int, Int, Boolean) = {
      if (payload == null || payload.length < 4) (0, 0, false)
      else {
        // fake: fold the first/last bytes into bounded "dimensions"
        val w = 64 + (java.lang.Byte.toUnsignedInt(payload(0)) % 64) * 16
        val h = 64 + (java.lang.Byte.toUnsignedInt(payload(payload.length - 1)) % 64) * 16
        (w, h, true)
      }
    }
  }

  /** Build a media table from any (id, payload-bytes) source. In tests the
    * payloads are fixture text bytes; in production, binaryFile reads. */
  def mediaTable(df: DataFrame, idCol: String, payloadCol: String,
                 format: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"),
      col(payloadCol).cast("binary").as("media"),
      lit(format).as("format"),
      length(col(payloadCol).cast("binary")).cast("long").as("n_bytes"))

  /** Ingest real files as binary payloads (Spark's binaryFile source:
    * path/length/modificationTime/content schema). */
  def readBinaryFiles(spark: SparkSession, glob: String): DataFrame =
    spark.read.format("binaryFile").load(glob)
      .select(col("path"), col("length").as("n_bytes"),
        col("content").as("media"))

  /** Decode metadata via mapPartitions — the batch-shaped decode path:
    * one codec per partition, streaming the iterator (no materialization
    * of the whole partition in memory). */
  def decodeMeta(spark: SparkSession, media: Dataset[MediaRecord]): Dataset[DecodedMeta] = {
    import spark.implicits._
    media.mapPartitions { it =>
      val codec = FakeCodec.open() // once per partition
      it.map { r =>
        val (w, h, ok) = codec.decodeMeta(r.media)
        DecodedMeta(r.id, r.format, w, h,
          if (r.media == null) 0L else r.media.length.toLong, ok)
      }
    }
  }

  /** Feature extraction: 64-bin byte histogram, L1-normalized — a real
    * (non-stub) computation with the exact shape of an image-embedding
    * UDF: binary in, Array[Float] out, pure, per-row. */
  def byteHistogram(spark: SparkSession, media: Dataset[MediaRecord]): DataFrame = {
    import spark.implicits._
    media.map { r =>
      val hist = new Array[Float](64)
      if (r.media != null && r.media.nonEmpty) {
        var i = 0
        while (i < r.media.length) {
          hist(java.lang.Byte.toUnsignedInt(r.media(i)) / 4) += 1f
          i += 1
        }
        var j = 0
        while (j < 64) { hist(j) /= r.media.length; j += 1 }
      }
      (r.id, hist)
    }.toDF("id", "features")
  }

  /** STUB resize: deterministic truncate/pad to targetBytes (stands in
    * for a pixel resample; preserves the binary-in/binary-out shape). */
  def resize(df: DataFrame, targetBytes: Int): DataFrame =
    df.withColumn("media",
      rpad(col("media"), targetBytes, Array[Byte](0)))

  /** Frame sampling: split the payload into n equal "frames" (stub for
    * video keyframe extraction) — explodes to one row per frame with the
    * frame index, the real fan-out shape of video pipelines. */
  def sampleFrames(df: DataFrame, n: Int): DataFrame = {
    val frameLen = (length(col("media")) / n).cast("int")
    df.select(col("id"),
        posexplode(transform(sequence(lit(0), lit(n - 1)),
          i => substring(col("media"), (i * frameLen + 1).cast("int"),
            greatest(frameLen, lit(1))))).as(Seq("frame_idx", "frame")))
      .filter(length(col("frame")) > 0)
  }
}

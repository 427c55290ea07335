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
  * Metadata decode is REAL: [[ImageHeaderCodec]] parses PNG IHDR, JPEG
  * SOFn, and GIF logical-screen headers directly from payload bytes (no
  * image library needed — container headers are a few dozen bytes of
  * documented big/little-endian fields). Full pixel decode (which WOULD
  * need a codec library absent from this environment) is out of scope;
  * everything metadata-shaped is parsed for real, and unrecognized or
  * truncated payloads yield `valid=false` rather than fake dimensions.
  */
object MultimodalOps {

  case class MediaRecord(id: Long, media: Array[Byte], format: String)

  case class DecodedMeta(id: Long, format: String, width: Int, height: Int,
                         n_bytes: Long, valid: Boolean)

  /** Pure-JVM image header parser. Formats:
    *   - PNG: 8-byte signature then the IHDR chunk (must be first per the
    *     PNG spec): length=13, type "IHDR", width/height as 4-byte
    *     big-endian at offsets 16/20.
    *   - JPEG: SOI (FFD8) then a marker walk; frame dimensions live in the
    *     SOFn segment (C0-CF minus DHT C4 / JPG C8 / DAC CC) as big-endian
    *     height,width after the 1-byte precision. Stops at SOS/EOI —
    *     dimensionless-until-DNL streams are treated as invalid.
    *   - GIF: "GIF87a"/"GIF89a" then little-endian width,height.
    * Anything else — including null, truncated, or non-image bytes —
    * returns (0, 0, false). Detection is by magic bytes, not the declared
    * format column, so a mislabeled payload still decodes correctly.
    */
  object ImageHeaderCodec {
    /** Per-partition "codec handle" — real codecs are expensive to init,
      * so the contract is one init per partition, not per row. (This
      * parser is stateless, but callers must keep the per-partition shape
      * so swapping in a JNI decoder stays a one-object change.) */
    def open(): ImageHeaderCodec = new ImageHeaderCodec
  }
  final class ImageHeaderCodec {
    private def u8(b: Array[Byte], i: Int): Int = java.lang.Byte.toUnsignedInt(b(i))
    private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
    private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
    private def be32(b: Array[Byte], i: Int): Long =
      (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

    private val PngSig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)

    private def png(b: Array[Byte]): (Int, Int, Boolean) = {
      // signature(8) + chunk len(4) + "IHDR"(4) + width(4) + height(4)
      if (b.length < 24) return (0, 0, false)
      if (be32(b, 8) != 13L) return (0, 0, false) // IHDR payload is exactly 13 bytes
      if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R'))
        return (0, 0, false)
      val w = be32(b, 16)
      val h = be32(b, 20)
      // PNG caps dimensions at 2^31-1; zero is invalid per spec
      if (w < 1 || h < 1 || w > Int.MaxValue || h > Int.MaxValue) (0, 0, false)
      else (w.toInt, h.toInt, true)
    }

    private def jpeg(b: Array[Byte]): (Int, Int, Boolean) = {
      var i = 2 // past SOI
      while (i + 1 < b.length) {
        if (u8(b, i) != 0xFF) return (0, 0, false) // lost marker sync
        var j = i
        while (j + 1 < b.length && u8(b, j + 1) == 0xFF) j += 1 // fill bytes
        if (j + 1 >= b.length) return (0, 0, false)
        val marker = u8(b, j + 1)
        marker match {
          case 0xD8 | 0x01 => i = j + 2 // SOI/TEM: no payload
          case m if m >= 0xD0 && m <= 0xD7 => i = j + 2 // RSTn: no payload
          case 0xD9 | 0xDA => return (0, 0, false) // EOI / scan before any SOF
          case m if m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC =>
            // SOFn: len(2) precision(1) height(2) width(2)
            if (j + 9 >= b.length || be16(b, j + 2) < 8) return (0, 0, false)
            val h = be16(b, j + 5)
            val w = be16(b, j + 7)
            return if (w > 0 && h > 0) (w, h, true) else (0, 0, false)
          case _ =>
            if (j + 3 >= b.length) return (0, 0, false)
            val len = be16(b, j + 2)
            if (len < 2) return (0, 0, false)
            i = j + 2 + len
        }
      }
      (0, 0, false)
    }

    private def gif(b: Array[Byte]): (Int, Int, Boolean) = {
      if (b.length < 10) return (0, 0, false)
      val w = le16(b, 6)
      val h = le16(b, 8)
      if (w > 0 && h > 0) (w, h, true) else (0, 0, false)
    }

    /** (width, height, valid); (0,0,false) for anything unrecognized. */
    def decodeMeta(payload: Array[Byte]): (Int, Int, Boolean) = {
      val b = payload
      if (b == null || b.length < 10) (0, 0, false)
      else if ((0 until 8).forall(k => u8(b, k) == PngSig(k))) png(b)
      else if (u8(b, 0) == 0xFF && u8(b, 1) == 0xD8) jpeg(b)
      else if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
               (b(4) == '7' || b(4) == '9') && b(5) == 'a') gif(b)
      else (0, 0, false)
    }
  }

  case class AvMeta(id: Long, kind: String, duration_ms: Long,
                    sample_rate: Int, channels: Int, n_bytes: Long,
                    valid: Boolean)

  /** Pure-JVM audio/video container header parser — the audio/video leg of
    * the multimodal contract, same philosophy as [[ImageHeaderCodec]]:
    * container headers are documented fixed-endian fields, so duration /
    * sample-rate / channel metadata parses for real without any media
    * library; sample decode stays out of scope.
    *
    * Formats:
    *   - WAV (RIFF spec): "RIFF" + size + "WAVE", then even-padded chunks
    *     of (id(4), size(le32)). "fmt " carries format/channels(le16),
    *     sampleRate/byteRate(le32); the "data" chunk size over byteRate
    *     gives duration.
    *   - MP4 (ISO BMFF spec): big-endian (size(4), type(4)) box walk —
    *     size==1 switches to a 64-bit largesize. Duration lives in
    *     moov/mvhd: version 0 packs timescale/duration as 32-bit at
    *     offsets 12/16 past the box header, version 1 as 32/64-bit at
    *     20/24 (8-byte creation/modification times).
    * Anything unrecognized/truncated ⇒ valid=false, zero fields. */
  object AvHeaderCodec {
    def open(): AvHeaderCodec = new AvHeaderCodec
  }
  final class AvHeaderCodec {
    private def u8(b: Array[Byte], i: Int): Int = java.lang.Byte.toUnsignedInt(b(i))
    private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
    private def le32(b: Array[Byte], i: Int): Long =
      u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
        (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
    private def be32(b: Array[Byte], i: Int): Long =
      (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
    private def be64(b: Array[Byte], i: Int): Long =
      (be32(b, i) << 32) | be32(b, i + 4)
    private def tag(b: Array[Byte], i: Int, s: String): Boolean =
      i + 4 <= b.length && (0 until 4).forall(k => (b(i + k) & 0xFF) == s.charAt(k))

    private val none = ("", 0L, 0, 0, false)

    private def wav(b: Array[Byte]): (String, Long, Int, Int, Boolean) = {
      if (b.length < 12 || !tag(b, 8, "WAVE")) return none
      var i = 12L
      var sampleRate = 0; var channels = 0; var byteRate = 0L
      var dataBytes = -1L
      while (i + 8 <= b.length) {
        val at = i.toInt
        val size = le32(b, at + 4)
        val body = at + 8
        if (tag(b, at, "fmt ")) {
          if (size < 16 || body + 16 > b.length) return none
          channels = le16(b, body + 2)
          sampleRate = le32(b, body + 4).toInt
          byteRate = le32(b, body + 8)
        } else if (tag(b, at, "data")) {
          // a truncated payload can DECLARE more data than it carries —
          // clamp to the bytes actually present so duration_ms never
          // overstates a corrupt/partial file (mvhd reads are
          // bounds-checked; this is the WAV-side equivalent)
          dataBytes = math.min(size, (b.length - body).toLong)
        }
        // Long arithmetic: a corrupt 4-byte size near 2^32 would wrap Int
        // and walk the cursor BACKWARDS — an executor-side infinite loop.
        // Monotonic-progress is part of the parse contract.
        i = body.toLong + size + (size & 1L) // chunks are even-padded
      }
      if (sampleRate <= 0 || channels <= 0 || byteRate <= 0 || dataBytes < 0) none
      else ("wav", dataBytes * 1000 / byteRate, sampleRate, channels, true)
    }

    /** Walk sibling boxes in [from, to) looking for `box`; returns the
      * (bodyStart, bodyEnd) of the first match. */
    private def findBox(b: Array[Byte], from: Int, to: Int,
                        box: String): Option[(Int, Int)] = {
      var i = from
      while (i + 8 <= to) {
        val size32 = be32(b, i)
        val (body, end) =
          if (size32 == 1L) {
            if (i + 16 > to) return None
            (i + 16, i + be64(b, i + 8))
          } else if (size32 == 0L) (i + 8, to.toLong) // box extends to EOF
          else (i + 8, i + size32)
        if (end < body || end > to) return None
        if (tag(b, i + 4, box)) return Some((body, end.toInt))
        i = end.toInt
      }
      None
    }

    private def mp4(b: Array[Byte]): (String, Long, Int, Int, Boolean) = {
      val r = for {
        (moovBody, moovEnd) <- findBox(b, 0, b.length, "moov")
        (mvhdBody, mvhdEnd) <- findBox(b, moovBody, moovEnd, "mvhd")
      } yield {
        val version = u8(b, mvhdBody)
        // only mvhd versions 0 and 1 exist; reading a forward/corrupt
        // version with v0 offsets would interpret creation-time bytes as
        // timescale/duration and could come back "valid" with garbage
        if (version > 1) none
        else {
          val (tsOff, durLen) = if (version == 1) (20, 8) else (12, 4)
          if (mvhdBody + tsOff + 4 + durLen > mvhdEnd) none
          else {
            val timescale = be32(b, mvhdBody + tsOff)
            val duration =
              if (durLen == 8) be64(b, mvhdBody + tsOff + 4)
              else be32(b, mvhdBody + tsOff + 4)
            // duration*1000 must not wrap Long (a ~2^62-tick "duration"
            // is corrupt data, not a 146-million-year video)
            if (timescale <= 0 || duration < 0 ||
                duration > Long.MaxValue / 1000) none
            else ("mp4", duration * 1000 / timescale, 0, 0, true)
          }
        }
      }
      r.getOrElse(none)
    }

    /** (kind, durationMs, sampleRate, channels, valid); detection is by
      * magic bytes (RIFF header / an ftyp-or-moov leading box). */
    def decodeMeta(payload: Array[Byte]): (String, Long, Int, Int, Boolean) = {
      val b = payload
      if (b == null || b.length < 12) none
      else if (tag(b, 0, "RIFF")) wav(b)
      else if (tag(b, 4, "ftyp") || tag(b, 4, "moov")) mp4(b)
      else none
    }
  }

  /** Audio/video metadata decode — same per-partition codec contract as
    * [[decodeMeta]]. */
  def decodeAvMeta(spark: SparkSession, media: Dataset[MediaRecord]): Dataset[AvMeta] = {
    import spark.implicits._
    spreadDs(media).mapPartitions { it =>
      val codec = AvHeaderCodec.open()
      it.map { r =>
        val (kind, durMs, rate, ch, ok) = codec.decodeMeta(r.media)
        AvMeta(r.id, kind, durMs, rate, ch,
          if (r.media == null) 0L else r.media.length.toLong, ok)
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

  /** Parallelism floor for the decode paths: a media table read from one
    * parquet file is ONE partition, and mapPartitions inherits it — the
    * whole corpus would decode in a single task (the Materialize.spread
    * failure shape, Dataset-typed). */
  private def spreadDs[T](ds: Dataset[T]): Dataset[T] =
    graft.functions.Materialize.spread(ds)

  /** Decode metadata via mapPartitions — the batch-shaped decode path:
    * one codec per partition, streaming the iterator (no materialization
    * of the whole partition in memory). */
  def decodeMeta(spark: SparkSession, media: Dataset[MediaRecord]): Dataset[DecodedMeta] = {
    import spark.implicits._
    spreadDs(media).mapPartitions { it =>
      val codec = ImageHeaderCodec.open() // once per partition
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
    spreadDs(media).map { r =>
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

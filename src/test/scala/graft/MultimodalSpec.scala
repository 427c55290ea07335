package graft

import graft.operators.MultimodalOps
import graft.operators.MultimodalOps.MediaRecord
import org.apache.spark.sql.functions._

/** Multimodal binary-column plumbing (decode stub, features, frames). */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  /** Fixture media: document text bytes as fake payloads. */
  private lazy val media = MultimodalOps.mediaTable(
    table("documents").select(col("doc_id"), col("text").cast("binary").as("payload")),
    "doc_id", "payload", "fake/text")

  private lazy val mediaDs = media
    .select(col("id"), col("media"), col("format"))
    .as[MediaRecord]

  test("media table schema: heavy payload isolated from metadata columns") {
    assert(media.columns.toSet == Set("id", "media", "format", "n_bytes"))
    // metadata-only projection must not read the binary column
    val plan = media.select("id", "n_bytes")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ReadSchema") || !plan.split("ReadSchema")(1).contains("media"),
      s"metadata projection still reads payload:\n$plan")
  }

  // ---- planted real image bytes (hand-built to the container specs) ----

  /** Minimal well-formed PNG prefix: signature + IHDR chunk. */
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(33)
    out.put(Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    out.putInt(13).put("IHDR".getBytes("US-ASCII"))
    out.putInt(w).putInt(h)
    out.put(Array[Byte](8, 6, 0, 0, 0)) // bit depth, color type, ...
    out.putInt(0) // CRC (not validated by a header parser)
    out.array()
  }

  /** Minimal JPEG: SOI, APP0(JFIF), SOFn carrying the dims, EOI. */
  private def jpegBytes(w: Int, h: Int, sofMarker: Int = 0xC0): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(4 + 18 + 13 + 2)
    out.put(0xFF.toByte).put(0xD8.toByte)                  // SOI
    out.put(0xFF.toByte).put(0xE0.toByte).putShort(16)     // APP0, len 16
    out.put("JFIF".getBytes("US-ASCII")).put(new Array[Byte](10))
    out.put(0xFF.toByte).put(sofMarker.toByte).putShort(11)// SOFn, len 11
    out.put(8.toByte).putShort(h.toShort).putShort(w.toShort)
    out.put(1.toByte).put(Array[Byte](1, 0x11, 0))         // 1 component
    out.put(0xFF.toByte).put(0xD9.toByte)                  // EOI
    out.array()
  }

  /** Minimal GIF89a logical screen descriptor. */
  private def gifBytes(w: Int, h: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(13).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("GIF89a".getBytes("US-ASCII"))
    out.putShort(w.toShort).putShort(h.toShort)
    out.put(new Array[Byte](3))
    out.array()
  }

  test("decodeMeta parses planted PNG / JPEG / progressive-JPEG / GIF dims") {
    val planted = Seq(
      MediaRecord(1L, pngBytes(640, 480), "png"),
      MediaRecord(2L, jpegBytes(800, 600), "jpeg"),
      MediaRecord(3L, jpegBytes(1920, 1080, sofMarker = 0xC2), "jpeg"), // SOF2
      MediaRecord(4L, gifBytes(320, 200), "gif"))
    val metas = MultimodalOps.decodeMeta(spark, planted.toDS())
      .collect().map(m => m.id -> ((m.width, m.height, m.valid))).toMap
    assert(metas(1L) == ((640, 480, true)))
    assert(metas(2L) == ((800, 600, true)))
    assert(metas(3L) == ((1920, 1080, true)))
    assert(metas(4L) == ((320, 200, true)))
  }

  test("decodeMeta rejects non-image, truncated, and dimensionless payloads") {
    val bad = Seq(
      MediaRecord(1L, "just some document text".getBytes("UTF-8"), "txt"),
      MediaRecord(2L, pngBytes(640, 480).take(12), "png"),          // truncated
      MediaRecord(3L, Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xD9.toByte), "jpeg"), // SOI+EOI, no SOF
      MediaRecord(4L, pngBytes(0, 480), "png"),                     // zero width
      MediaRecord(5L, null, "png"))
    val metas = MultimodalOps.decodeMeta(spark, bad.toDS()).collect()
    assert(metas.length == 5)
    metas.foreach { m =>
      assert(!m.valid, s"id=${m.id} should be invalid")
      assert(m.width == 0 && m.height == 0)
    }
  }

  test("decodeMeta over the fixture corpus: text payloads all invalid, deterministic") {
    val a = MultimodalOps.decodeMeta(spark, mediaDs).collect()
    assert(a.length == table("documents").count())
    a.foreach(m => assert(!m.valid && m.n_bytes > 0)) // text bytes are not images
    val b = MultimodalOps.decodeMeta(spark, mediaDs).collect()
    assert(a.map(m => m.id -> ((m.width, m.height, m.valid))).toMap ==
      b.map(m => m.id -> ((m.width, m.height, m.valid))).toMap)
  }

  test("byteHistogram: 64 bins, L1-normalized") {
    val feats = MultimodalOps.byteHistogram(spark, mediaDs).collect()
    feats.foreach { r =>
      val h = r.getSeq[Float](1)
      assert(h.length == 64)
      val s = h.sum
      assert(math.abs(s - 1.0f) < 1e-3, s"histogram sums to $s")
    }
  }

  test("resize pads/truncates payloads to the target size") {
    val out = MultimodalOps.resize(media, 128)
      .select(length(col("media")).as("len")).collect()
    assert(out.forall(_.getAs[Int]("len") == 128))
  }

  test("sampleFrames: n frames per media row, indexed") {
    val frames = MultimodalOps.sampleFrames(media, 4).collect()
    val byId = frames.groupBy(_.getAs[Long]("id"))
    byId.foreach { case (_, fs) =>
      assert(fs.length == 4)
      assert(fs.map(_.getAs[Int]("frame_idx")).sorted.toSeq == Seq(0, 1, 2, 3))
    }
  }

  // ---- planted audio/video container bytes (built to the public specs) ----

  /** Minimal WAV: RIFF/WAVE + fmt(16) + data chunk of `dataBytes`. */
  private def wavBytes(rate: Int, channels: Int, bitsPerSample: Int,
                       dataBytes: Int): Array[Byte] = {
    val byteRate = rate * channels * bitsPerSample / 8
    val out = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
    out.put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
    out.putShort(1).putShort(channels.toShort).putInt(rate).putInt(byteRate)
    out.putShort((channels * bitsPerSample / 8).toShort)
    out.putShort(bitsPerSample.toShort)
    out.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    out.put(new Array[Byte](dataBytes))
    out.array()
  }

  /** Minimal MP4: ftyp box + moov/mvhd with the given timescale/duration. */
  private def mp4Bytes(timescale: Int, duration: Long,
                       version: Int = 0): Array[Byte] = {
    val mvhdBody = if (version == 1) 4 + 8 + 8 + 4 + 8 else 4 + 4 + 4 + 4 + 4
    val mvhdSize = 8 + mvhdBody
    val moovSize = 8 + mvhdSize
    val out = java.nio.ByteBuffer.allocate(16 + moovSize)
    out.putInt(16).put("ftyp".getBytes("US-ASCII"))
    out.put("isom".getBytes("US-ASCII")).putInt(512)
    out.putInt(moovSize).put("moov".getBytes("US-ASCII"))
    out.putInt(mvhdSize).put("mvhd".getBytes("US-ASCII"))
    out.put(version.toByte).put(new Array[Byte](3)) // version + flags
    if (version == 1) {
      out.putLong(0L).putLong(0L) // creation/modification (64-bit)
      out.putInt(timescale).putLong(duration)
    } else {
      out.putInt(0).putInt(0) // creation/modification (32-bit)
      out.putInt(timescale).putInt(duration.toInt)
    }
    out.array()
  }

  test("decodeAvMeta parses planted WAV and MP4 (mvhd v0 and v1) headers") {
    val planted = Seq(
      // 44100 Hz stereo 16-bit, 1s of samples: 176400 data bytes
      MediaRecord(1L, wavBytes(44100, 2, 16, 176400), "wav"),
      MediaRecord(2L, mp4Bytes(timescale = 600, duration = 1800), "mp4"),  // 3 s
      MediaRecord(3L, mp4Bytes(timescale = 90000, duration = 450000, version = 1), "mp4")) // 5 s
    val metas = MultimodalOps.decodeAvMeta(spark, planted.toDS())
      .collect().map(m => m.id -> m).toMap
    assert(metas(1L).kind == "wav" && metas(1L).valid)
    assert(metas(1L).duration_ms == 1000)
    assert(metas(1L).sample_rate == 44100 && metas(1L).channels == 2)
    assert(metas(2L).kind == "mp4" && metas(2L).valid && metas(2L).duration_ms == 3000)
    assert(metas(3L).kind == "mp4" && metas(3L).valid && metas(3L).duration_ms == 5000)
  }

  test("decodeAvMeta rejects truncated, mislabeled, and non-AV payloads") {
    val bad = Seq(
      MediaRecord(1L, "plain text, not a container".getBytes("UTF-8"), "wav"),
      MediaRecord(2L, wavBytes(44100, 2, 16, 1000).take(20), "wav"),   // truncated fmt
      MediaRecord(3L, mp4Bytes(600, 1800).take(18), "mp4"),            // ftyp only, no moov
      MediaRecord(4L, wavBytes(0, 0, 8, 0), "wav"),                    // zero-rate fmt
      MediaRecord(5L, null, "mp4"),
      MediaRecord(6L, pngBytes(64, 64), "wav"),                        // an image, mislabeled audio
      MediaRecord(7L, { // corrupt chunk size near 2^32: must terminate, not loop
        val w = wavBytes(44100, 2, 16, 100)
        w(16 + 2) = 0xFF.toByte; w(16 + 3) = 0xFF.toByte // fmt size hi-bytes
        w
      }, "wav"),
      // mvhd versions beyond 1 don't exist — v0-offset reads would yield
      // garbage marked valid
      MediaRecord(8L, mp4Bytes(600, 1800, version = 7), "mp4"),
      // a ~2^62-tick duration would wrap duration*1000 into a negative ms
      MediaRecord(9L, mp4Bytes(90000, Long.MaxValue / 2, version = 1), "mp4"))
    val metas = MultimodalOps.decodeAvMeta(spark, bad.toDS()).collect()
    assert(metas.length == 9)
    metas.foreach { m =>
      assert(!m.valid, s"id=${m.id} should be invalid")
      assert(m.duration_ms == 0 && m.sample_rate == 0)
    }
  }

  test("decode paths floor parallelism on a one-partition media table") {
    val one = mediaDs.coalesce(1)
    assert(one.rdd.getNumPartitions == 1)
    val want = spark.sparkContext.defaultParallelism
    assert(MultimodalOps.decodeMeta(spark, one).rdd.getNumPartitions >= want,
      "image decode inherited the single partition")
    assert(MultimodalOps.decodeAvMeta(spark, one).rdd.getNumPartitions >= want,
      "AV decode inherited the single partition")
  }

  test("binaryFile source reads fixture files as payloads") {
    val bf = MultimodalOps.readBinaryFiles(spark, s"$sf/region.parquet")
    val rows = bf.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_bytes") > 0)
      assert(r.getAs[Array[Byte]]("media").nonEmpty)
    }
  }
}

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

  test("decodeMeta: mapPartitions decode produces valid bounded dims") {
    val metas = MultimodalOps.decodeMeta(spark, mediaDs).collect()
    assert(metas.length == table("documents").count())
    metas.foreach { m =>
      assert(m.valid)
      assert(m.width >= 64 && m.width < 64 + 64 * 16)
      assert(m.height >= 64 && m.height < 64 + 64 * 16)
      assert(m.n_bytes > 0)
    }
  }

  test("decodeMeta is deterministic across runs") {
    val a = MultimodalOps.decodeMeta(spark, mediaDs).collect()
      .map(m => m.id -> (m.width, m.height)).toMap
    val b = MultimodalOps.decodeMeta(spark, mediaDs).collect()
      .map(m => m.id -> (m.width, m.height)).toMap
    assert(a == b)
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

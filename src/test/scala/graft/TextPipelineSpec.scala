package graft

import org.apache.spark.sql.functions._

/** Semantic checks for the text-pipeline family (chunking, redaction,
  * language-ID) and the deterministic source-mixing sampler. */
class TextPipelineSpec extends SparkSpec {

  test("q_chunk_docs: chunks cover every token, stride/length respected") {
    val chunks = q("q_chunk_docs").collect()
    val docToks = table("documents").select(col("doc_id"),
        size(split(col("text"), " ")).as("n"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n")).toMap
    chunks.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, rs) =>
      val n = docToks(id)
      // chunk count = number of stride starts ≤ n
      assert(rs.length == (n + 23) / 24, s"doc $id: ${rs.length} chunks for $n toks")
      rs.foreach { r =>
        val cid = r.getAs[Int]("chunk_id")
        val len = r.getAs[Int]("n_toks")
        val expected = math.min(32, n - cid * 24)
        assert(len == expected, s"doc $id chunk $cid: len $len != $expected")
      }
    }
    // reassembling non-overlapping prefixes of each chunk yields the doc
    val doc0 = table("documents").filter(col("doc_id") === 0)
      .select(col("text")).head().getString(0)
    val rebuilt = chunks.filter(_.getAs[Long]("doc_id") == 0)
      .sortBy(_.getAs[Int]("chunk_id"))
      .map(_.getAs[String]("chunk_text").split(" ").take(24))
      .flatten.mkString(" ")
    assert(doc0.startsWith(rebuilt.take(doc0.length))
      && doc0.split(" ").length <= rebuilt.split(" ").length + 32)
  }

  test("q_redact: masked term count matches n_red; no term survives") {
    val rows = q("q_redact").collect()
    val orig = table("documents").select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val terms = Set("customer", "value", "key")
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val red = r.getAs[String]("red")
      val expected = orig(id).split(" ").count(terms.contains)
      assert(r.getAs[Int]("n_red") == expected, s"doc $id count")
      assert(!red.split(" ").exists(terms.contains), s"doc $id leaked a term")
      assert(red.split(" ").count(_ == "[X]") == expected, s"doc $id masks")
    }
  }

  test("q_lang_id: confusion counts sum to corpus; detected is closed set") {
    val rows = q("q_lang_id").collect()
    assert(rows.map(_.getAs[Long]("n")).sum == table("documents").count())
    val dets = rows.map(_.getAs[String]("detected")).toSet
    assert(dets.subsetOf(Set("en", "es", "fr", "de", "und")))
  }

  test("q_source_mix: full-weight sources keep everything, kept <= total") {
    val rows = q("q_source_mix").collect()
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val kept = r.getAs[Long]("n_kept")
      val total = r.getAs[Long]("n_total")
      assert(kept <= total)
      if (src.stripPrefix("src").toInt % 4 == 0)
        assert(kept == total, s"$src is a weight-1.0 source")
    }
    // deterministic: same counts on a second run
    assert(q("q_source_mix").collect().map(_.toSeq.toList).toList
      == rows.map(_.toSeq.toList).toList)
  }

  test("q_bpe_merge: merges consume pair occurrences, token counts shrink") {
    val rows = q("q_bpe_merge").collect()
    assert(rows.length == table("documents").count())
    val pair = rows.head.getAs[String]("pair")
    val pairCount = rows.head.getAs[Long]("pair_count")
    val mergedTok = pair.replace(' ', '_')
    // every corpus occurrence merges at most once (exactly once when no
    // occurrences overlap); the merged token appears iff merges happened
    assert(rows.map(_.getAs[Long]("n_merges")).sum <= pairCount)
    assert(rows.map(_.getAs[Long]("n_merges")).sum > 0)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_merges")
      val m = r.getAs[String]("merged")
      assert(n >= 0)
      assert(m.split(" ").count(_ == mergedTok) == n)
    }
  }
}

package graft

import org.apache.spark.sql.functions._

/** Semantic checks for the corpus-curation family: quality filtering,
  * decontamination, sequence packing, OOV filtering. */
class PipelineSpec extends SparkSpec {

  test("q_quality_filter: drop buckets are disjoint and sum to n_docs") {
    val rows = q("q_quality_filter").collect()
    rows.foreach { r =>
      val total = r.getAs[Long]("drop_len") + r.getAs[Long]("drop_ttr") +
        r.getAs[Long]("drop_stop") + r.getAs[Long]("n_kept")
      assert(total == r.getAs[Long]("n_docs"),
        s"${r.getAs[String]("lang")}: buckets don't partition the corpus")
    }
    assert(rows.map(_.getAs[Long]("n_docs")).sum == table("documents").count())
  }

  test("q_decontaminate: every reported doc shares a 5-gram with the eval set") {
    val docs = table("documents").select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    def grams(t: String): Set[String] =
      t.split(" ").sliding(5).filter(_.length == 5).map(_.mkString(" ")).toSet
    val ev = docs.filter(_._1 < 10).values.flatMap(grams).toSet
    val expected = docs.filter(_._1 >= 10)
      .map { case (id, t) => id -> grams(t).count(ev.contains) }
      .filter(_._2 > 0)
    val got = q("q_decontaminate").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_hit_grams").toInt)
      .toMap
    assert(got == expected, s"got $got expected $expected")
  }

  test("q_pack_sequences: bins are contiguous per source, token counts add up") {
    val rows = q("q_pack_sequences").collect()
    val bySrc = rows.groupBy(_.getAs[String]("source"))
    bySrc.foreach { case (src, rs) =>
      val bins = rs.map(_.getAs[Long]("bin")).sorted.toSeq
      assert(bins.head == 0 && bins == (bins.head to bins.last).toSeq,
        s"$src: bins not contiguous: ${bins.toSeq}")
    }
    val totalToks = rows.map(_.getAs[Long]("bin_toks")).sum
    val expect = table("documents")
      .select(sum(size(split(col("text"), " ")))).head().getLong(0)
    assert(totalToks == expect)
  }

  test("q_curation_pipeline: bins hold exactly the quality-kept survivors") {
    val stop = Set("data", "processing", "the", "and", "of")
    val docs = table("documents").select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text").split(" "))
    val qualityKept = docs.filter { case (_, tk) =>
      tk.length >= 15 && tk.distinct.length * 10 >= tk.length * 3 &&
        tk.count(stop.contains) * 8 <= tk.length
    }.map(_._1).toSet
    val dupDrop = q("q_dedup_cluster").collect()
      .filter(r => r.getAs[Long]("id") != r.getAs[Long]("cluster"))
      .map(_.getAs[Long]("id")).toSet
    val contam = q("q_decontaminate").collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val curated = qualityKept -- dupDrop -- contam
    val rows = q("q_curation_pipeline").collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == curated.size)
    val tokSum = docs.filter(d => curated.contains(d._1)).map(_._2.length).sum
    assert(rows.map(_.getAs[Long]("bin_toks")).sum == tokSum)
  }

  test("q_vocab_oov: ratios consistent, keep matches the integer rule") {
    q("q_vocab_oov").collect().foreach { r =>
      val n = r.getAs[Long]("n"); val oov = r.getAs[Long]("n_oov")
      assert(oov <= n)
      assert(r.getAs[Int]("keep") == (if (oov * 10 <= n * 3) 1 else 0))
    }
  }

  test("q_split_leakage: near-dup pairs never straddle a split boundary") {
    val rows = q("q_split_leakage").collect()
    val split = rows.map(r => r.getAs[Long]("doc_id") ->
      r.getAs[String]("split")).toMap
    val cluster = rows.map(r => r.getAs[Long]("doc_id") ->
      r.getAs[Long]("cluster")).toMap
    // every doc assigned, closed split set, non-degenerate partition
    assert(split.size == table("documents").count())
    assert(split.values.toSet.subsetOf(Set("train", "val", "test")))
    assert(split.values.toSet.size >= 2, "all docs fell in one split")
    // the guarantee: both ends of every LSH-verified near-dup pair carry
    // the same cluster AND the same split (non-vacuous: fixtures yield
    // near-dup pairs — q_dedup_cluster's relation is non-empty)
    val pairs = graft.operators.DedupQueries.minhashPairs(spark, sf)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "no near-dup pairs: the leakage check is vacuous")
    pairs.foreach { case (a, b) =>
      assert(cluster(a) == cluster(b), s"pair ($a,$b) split across clusters")
      assert(split(a) == split(b),
        s"leak: pair ($a,$b) in ${split(a)} vs ${split(b)}")
    }
  }

  test("bloom-prescreened decontamination equals the exact path") {
    val exact = q("q_decontaminate").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bloomed = graft.operators.PipelineQueries
      .contaminatedBloom(spark, sf)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hit_grams"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bloomed == exact)
  }
}

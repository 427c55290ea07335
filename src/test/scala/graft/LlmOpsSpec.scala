package graft

import org.apache.spark.sql.functions._

/** Semantic checks for the LLM-pipeline operators (dedup / text stats /
  * similarity) on sf0.001. */
class LlmOpsSpec extends SparkSpec {

  test("q_dedup_exact: survivors unique, copies cover the corpus") {
    val rows = q("q_dedup_exact").collect()
    val ids = rows.map(_.getAs[Long]("doc_id"))
    assert(ids.distinct.length == ids.length)
    assert(rows.map(_.getAs[Long]("n_copies")).sum == table("documents").count())
  }

  test("q_ngram_jaccard: pairs ordered, jaccard in (0.1, 1]") {
    val rows = q("q_ngram_jaccard").collect()
    assert(rows.nonEmpty, "fixtures plant near-dups; expected pairs")
    rows.foreach { r =>
      assert(r.getAs[Long]("a_id") < r.getAs[Long]("b_id"))
      val j = r.getAs[Double]("jac")
      assert(j > 0.1 && j <= 1.0)
    }
  }

  test("q_fingerprint: fp stable across two runs; fp in [0, 1e9+7)") {
    val a = q("q_fingerprint").collect()
    val b = q("q_fingerprint").collect()
    assert(a.map(_.getAs[Long]("fp")).toSeq == b.map(_.getAs[Long]("fp")).toSeq)
    a.foreach { r =>
      val fp = r.getAs[Long]("fp")
      assert(fp >= 0 && fp < 1000000007L)
    }
    // identical texts (if any) share fingerprints: n_same >= 1 everywhere
    assert(a.forall(_.getAs[Long]("n_same") >= 1))
  }

  test("q_text_stats: doc counts partition the corpus") {
    val rows = q("q_text_stats").collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == table("documents").count())
    rows.foreach(r => assert(r.getAs[Double]("avg_toks") > 0))
  }

  test("q_quality_score: ratios bounded, quality in [0,1]") {
    q("q_quality_score").collect().foreach { r =>
      assert(r.getAs[Int]("n_uniq") <= r.getAs[Int]("n_toks"))
      val ttr = r.getAs[Double]("ttr")
      assert(ttr > 0 && ttr <= 1.0)
      val sr = r.getAs[Double]("stop_ratio")
      assert(sr >= 0 && sr <= 1.0)
      val qu = r.getAs[Double]("quality")
      assert(qu >= 0 && qu <= 1.0)
    }
  }

  test("q_ngrams: top-50 sorted by count desc then bigram") {
    val rows = q("q_ngrams").collect()
    assert(rows.length == 50)
    val cnts = rows.map(_.getAs[Long]("cnt"))
    assert(cnts.toSeq == cnts.sortBy(-_).toSeq)
  }

  test("q_cosine_topk: 20 neighbors, cosine descending within [-1,1]") {
    val rows = q("q_cosine_topk").collect()
    assert(rows.length == 20)
    val cs = rows.map(_.getAs[Double]("cos"))
    assert(cs.forall(c => c >= -1.0001 && c <= 1.0001))
    assert(cs.toSeq == cs.sortBy(-_).toSeq)
    assert(rows.forall(_.getAs[Long]("vec_id") != 0L))
  }

  test("q_knn_join: exactly 3 neighbors per probe, none self") {
    val rows = q("q_knn_join").collect()
    val byProbe = rows.groupBy(_.getAs[Long]("probe_id"))
    assert(byProbe.size == 20)
    byProbe.foreach { case (p, rs) =>
      assert(rs.length == 3)
      assert(rs.forall(_.getAs[Long]("vec_id") != p))
    }
  }

  test("q_vector_mean: 64 positions per label, bounded values") {
    val rows = q("q_vector_mean").collect()
    rows.groupBy(_.getAs[Int]("label")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Int]("pos")).sorted.toSeq == (1 to 64))
    }
    assert(rows.forall(r => math.abs(r.getAs[Double]("mean_v")) < 10))
  }
}

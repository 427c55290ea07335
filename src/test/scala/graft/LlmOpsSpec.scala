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

  test("q_dedup_exact: hash-grouped result equals naive text grouping") {
    val naive = table("documents")
      .groupBy(lower(trim(col("text"))).as("norm"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select("doc_id", "n_copies").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val hashed = q("q_dedup_exact").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_copies"))).toSeq
    assert(hashed == naive)
  }

  test("q_ngram_jaccard: grid-salted join equals unsalted blocked join") {
    val docs = table("documents")
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), col("lang"),
        element_at(col("toks"), 1).as("ft"),
        array_distinct(expr(
          """transform(sequence(1, size(toks) - 1),
            |  i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"""
            .stripMargin)).as("grams"))
    val a = docs.alias("a"); val b = docs.alias("b")
    graft.functions.NativeJaccard.register(spark)
    val jac = call_function(graft.functions.NativeJaccard.name,
      col("a.grams"), col("b.grams"))
    val unsalted = a.join(b,
        col("a.lang") === col("b.lang") && col("a.ft") === col("b.ft")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        jac.as("j"))
      .filter(col("j") > 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val salted = q("q_ngram_jaccard").collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).sorted.toSeq
    assert(salted == unsalted)
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

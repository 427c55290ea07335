package graft

import org.apache.spark.sql.functions._

/** Semantic checks for the statistical-analytics operators
  * (operators/AnalyticsQueries.scala). */
class AnalyticsSpec extends SparkSpec {

  test("q_token_entropy: bounds and exact value on a uniform doc") {
    val rows = q("q_token_entropy").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_toks")
      val h = r.getAs[Double]("entropy")
      // 0 ≤ H ≤ log2(n_toks) always
      assert(h >= 0.0 && h <= math.log(n.toDouble) / math.log(2.0) + 1e-9,
        s"doc ${r.get(0)}: H=$h outside [0, log2($n)]")
    }
    // a doc of n distinct tokens has H = log2(n) exactly
    import spark.implicits._
    val uni = Seq((1L, "a b c d")).toDF("doc_id", "text")
    uni.createOrReplaceTempView("unidoc")
    val h = spark.sql(
      """SELECT doc_id, SUM(n) n_toks FROM (
        |  SELECT doc_id, w, COUNT(*) n FROM (
        |    SELECT doc_id, EXPLODE(SPLIT(text, ' ')) w FROM unidoc)
        |  GROUP BY doc_id, w) GROUP BY doc_id""".stripMargin)
    assert(h.head().getAs[Long]("n_toks") == 4L)
  }

  test("q_unigram_logprob: scores are negative and repetitive docs score higher") {
    val rows = q("q_unigram_logprob").collect()
    assert(rows.nonEmpty)
    // log2 p < 0 for any non-degenerate corpus (every p < 1)
    rows.foreach { r =>
      assert(r.getAs[Double]("avg_logprob") < 0.0)
    }
    // n_toks agrees with the entropy query's token counts
    val byEnt = q("q_token_entropy").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_toks")).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_toks") == byEnt(r.getAs[Long]("doc_id")))
    }
  }

  test("q_event_anomaly: one row per (type, day); z mean ~0 per type") {
    val rows = q("q_event_anomaly").collect()
    val distinct = rows.map(r => (r.getString(0), r.get(1))).distinct
    assert(rows.length == distinct.length, "duplicate (type, day) rows")
    // z-scores within a type must average to ~0 (definition of z)
    rows.groupBy(_.getString(0)).foreach { case (tpe, rs) =>
      val zs = rs.map(_.getAs[Double]("z"))
      assert(math.abs(zs.sum / zs.length) < 1e-3,
        s"$tpe: z-scores don't center at 0")
      // flag agrees with the rounded z it was computed from
      rs.foreach { r =>
        val expect = if (math.abs(r.getAs[Double]("z")) > 2) 1 else 0
        assert(r.getAs[Int]("is_anomaly") == expect)
      }
    }
  }

  test("q_join_skew_salt: salted join equals the plain join") {
    val salted = q("q_join_skew_salt").collect()
    val ev = table("events")
    val dim = ev.groupBy("user_id")
      .agg(date_format(min(col("ts")), "yyyy-MM-dd").as("first_day"))
    val plain = ev.join(dim, Seq("user_id"))
      .groupBy("first_day")
      .agg(count(lit(1)).as("n_events"))
      .orderBy("first_day").collect()
    assert(salted.length == plain.length)
    salted.zip(plain).foreach { case (s, p) =>
      assert(s.getAs[String]("first_day") == p.getAs[String]("first_day"))
      assert(s.getAs[Long]("n_events") == p.getAs[Long]("n_events"))
    }
  }

  test("q_join_skew_salt: plan replicates the dim, not the fact") {
    val plan = q("q_join_skew_salt").queryExecution.executedPlan.toString()
    // the salt-side explode(sequence) must appear as a generator
    assert(plan.contains("Generate"), "expected dim-side explode in the plan")
  }

  test("q_editdist_pairs: symmetric-free, thresholded, matches brute force") {
    val pairs = q("q_editdist_pairs").collect()
    pairs.foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      assert(r.getAs[Long]("dist") <= 20L)
    }
    // brute-force levenshtein over all same-lang pairs with the same prefix
    // block must find exactly the same set
    val d = table("documents").select("doc_id", "lang", "text").collect()
    val brute = for {
      a <- d; b <- d
      if a.getAs[String]("lang") == b.getAs[String]("lang")
      if a.getAs[Long]("doc_id") < b.getAs[Long]("doc_id")
      if a.getAs[String]("text").take(24) == b.getAs[String]("text").take(24)
      dist = lev(a.getAs[String]("text"), b.getAs[String]("text"))
      if dist <= 20
    } yield (a.getAs[Long]("doc_id"), b.getAs[Long]("doc_id"), dist.toLong)
    assert(pairs.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      == brute.toSet)
  }

  test("q_agg_corr: corr bounded in [-1,1]; counts cover the stream") {
    val rows = q("q_agg_corr").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c = r.getAs[Double]("corr_vh")
      assert(c >= -1.0 && c <= 1.0, s"corr $c out of bounds")
    }
    assert(rows.map(_.getAs[Long]("n")).sum == table("events").count())
  }

  test("q_type_overlap: jaccard in (0,1], intersection bounded by sets") {
    val rows = q("q_type_overlap").collect()
    assert(rows.nonEmpty)
    val sizes = table("events").select("event_type", "user_id").distinct()
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("type_a"), r.getAs[String]("type_b"))
      assert(a < b, "pair not canonical")
      val j = r.getAs[Double]("jaccard")
      assert(j > 0.0 && j <= 1.0)
      assert(r.getAs[Long]("n_both") <= math.min(sizes(a), sizes(b)))
    }
  }

  test("q_source_hhi: HHI within [1/n_langs, 1]") {
    val rows = q("q_source_hhi").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getAs[Double]("hhi")
      val k = r.getAs[Long]("n_langs").toDouble
      assert(h >= 1.0 / k - 1e-4 && h <= 1.0 + 1e-9,
        s"source ${r.get(0)}: hhi=$h with $k langs")
    }
  }

  test("q_char_trigrams: 3-char grams, counts descending") {
    val rows = q("q_char_trigrams").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach(r => assert(r.getAs[String]("g").length == 3))
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.zip(ns.tail).forall { case (x, y) => x >= y })
  }

  /** Classic Wagner–Fischer, reference for the test only. */
  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = dp(0); dp(0) = j
      for (i <- 1 to a.length) {
        val cur = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(a.length)
  }
}

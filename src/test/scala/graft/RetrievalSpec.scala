package graft

import java.nio.file.Files

/** Planted-fixture semantics for RetrievalQueries + q_corr_matrix: posting
  * caps and order, the duplicate-kills-novelty identity, weighted-sample
  * dominance and the zero-weight exclusion, and the ±1/NULL corners of the
  * correlation matrix.
  */
class RetrievalSpec extends SparkSpec {

  private def run(name: String, dir: String) =
    SparkEntry.queries(name)(spark, dir)

  private def docs(d: String, rows: Seq[(Long, String, String, String, Long)]): String = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  test("inverted_index: df ranks, posting sorted and capped at 5") {
    val d = docs(Files.createTempDirectory("graft-inv").toString,
      (1L to 7L).map(i => (i, "top filler" + i, "en", "s", 10L)) :+
        (8L, "solo", "en", "s", 4L))
    // "top" in docs 1..7 (df 7), each "fillerN" df 1, "solo" df 1
    val rows = run("q_inverted_index", d).collect()
    val top = rows.head
    assert(top.getAs[String]("token") == "top")
    assert(top.getAs[Long]("df") == 7L)
    assert(top.getAs[String]("posting") == "1|2|3|4|5",
      "posting must be the 5 SMALLEST doc ids, ascending, pipe-joined")
    // ties on df=1 break by token asc; every posting is a single doc
    assert(rows.tail.forall(r => !r.getAs[String]("posting").contains("|")))
  }

  test("novelty: an exact duplicate contributes zero novelty") {
    val d = docs(Files.createTempDirectory("graft-nov").toString, Seq(
      (1L, "a b c d", "en", "A", 7L), // shingles {a b c, b c d} — all new
      (2L, "a b c d", "en", "B", 7L), // same shingles — novelty 0
      (3L, "x y z w", "en", "B", 7L))) // all new — novelty 1
    val m = run("q_novelty", d).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Double]("novelty"))).toMap
    assert(m("A") == ((1L, 1.0)))
    assert(m("B") == ((2L, 0.5)), "B = (0 + 2 new) / 4 shingles")
  }

  test("sample_weighted: dominant weight ranks first, zero weight excluded") {
    val d = docs(Files.createTempDirectory("graft-sw").toString,
      Seq((1L, "x", "en", "s", 1000000L), (99L, "x", "en", "s", 0L)) ++
        (2L to 11L).map(i => (i, "x", "en", "s", 1L)))
    val rows = run("q_sample_weighted", d).collect()
    assert(rows.length == 11, "n_chars = 0 must be excluded")
    assert(rows.map(_.getAs[Int]("rnk")).toSeq == (1 to 11),
      "ranks are dense 1..n")
    assert(rows.head.getAs[Long]("doc_id") == 1L,
      "the 10^6-weight doc must outrank unit-weight docs")
  }

  test("bm25: ranks and scores match an independent scorer") {
    val d = docs(Files.createTempDirectory("graft-bm25").toString, Seq(
      (1L, "aa aa bb", "en", "s", 8L),
      (2L, "aa cc", "en", "s", 5L),
      (3L, "bb bb bb cc", "en", "s", 11L)))
    // independent evaluation: N=3, every term df=2, dl = 3/2/4, avgdl=3
    def term(tf: Long, df: Long, dl: Long, n: Long, avgdl: Double): Long = {
      val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
      math.floor(idf * (tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))
        * 1e10 + 0.5).toLong
    }
    def score(terms: Seq[(Long, Long)], dl: Long): Double = {
      val si = terms.map { case (tf, df) => term(tf, df, dl, 3L, 3.0) }.sum
      math.floor(si.toDouble / 1e10 * 10000 + 0.5) / 10000
    }
    val expected = Map( // (doc, its query-term tfs)
      1L -> score(Seq((2L, 2L), (1L, 2L)), 3L), // aa×2, bb×1
      2L -> score(Seq((1L, 2L), (1L, 2L)), 2L), // aa, cc
      3L -> score(Seq((3L, 2L), (1L, 2L)), 4L)) // bb×3, cc
    val rows = run("q_bm25", d).collect()
      .map(r => (r.getAs[Int]("rnk"), r.getAs[Long]("doc_id"),
        r.getAs[Double]("score")))
    assert(rows.map(_._2).toSeq == Seq(1L, 3L, 2L),
      s"hand-derived order doc1 > doc3 > doc2: $rows")
    rows.foreach { case (_, doc, s) => assert(s == expected(doc),
      s"doc $doc: engine $s vs model ${expected(doc)}") }
  }

  test("corr_matrix: r = +1, r = -1, and NULL on a constant series") {
    val d = Files.createTempDirectory("graft-corr").toString
    import spark.implicits._
    import java.sql.Timestamp
    def day(n: Int) = Timestamp.valueOf(f"2024-01-$n%02d 12:00:00")
    // per day counts over 3 days: a = 1,2,3; b = 2,4,6 (r=+1 with a);
    // c = 3,2,1 (r=-1 with a); k = 2,2,2 (constant → NULL against all)
    val counts = Map("a" -> Seq(1, 2, 3), "b" -> Seq(2, 4, 6),
      "c" -> Seq(3, 2, 1), "k" -> Seq(2, 2, 2))
    var eid = 0L
    val rows = for {
      (tpe, perDay) <- counts.toSeq
      (n, di) <- perDay.zipWithIndex
      _ <- 1 to n
    } yield { eid += 1; (eid, day(di + 1), 1L, tpe, Option(1.0), "{}") }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    val m = run("q_corr_matrix", d).collect()
      .map(r => (r.getAs[String]("t1"), r.getAs[String]("t2")) ->
        Option(r.getAs[java.lang.Double]("r")).map(_.doubleValue)).toMap
    assert(m(("a", "b")) == Some(1.0))
    assert(m(("a", "c")) == Some(-1.0))
    assert(m(("a", "k")) == None, "zero variance must yield NULL, not NaN")
    assert(m.size == 6, "4 types = 6 unordered pairs")
  }

  test("corr_matrix: a type absent on some days is zero-filled, not dropped") {
    val d = Files.createTempDirectory("graft-corr2").toString
    import spark.implicits._
    import java.sql.Timestamp
    def day(n: Int) = Timestamp.valueOf(f"2024-01-$n%02d 12:00:00")
    // a on all 3 days (1,1,1); b only day 2 (0,2,0) — dense grid keeps
    // n_days = 3 and computes r over the zero-filled series
    val rows = Seq(
      (1L, day(1), 1L, "a", Option(1.0), "{}"),
      (2L, day(2), 1L, "a", Option(1.0), "{}"),
      (3L, day(3), 1L, "a", Option(1.0), "{}"),
      (4L, day(2), 1L, "b", Option(1.0), "{}"),
      (5L, day(2), 1L, "b", Option(1.0), "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    val r = run("q_corr_matrix", d).collect().head
    assert(r.getAs[Long]("n_days") == 3L)
    assert(Option(r.getAs[java.lang.Double]("r")).isEmpty,
      "constant a-series → NULL r even though b varies")
  }
}

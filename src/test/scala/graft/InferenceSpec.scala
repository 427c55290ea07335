package graft

import java.nio.file.Files

/** Planted-fixture semantics for the inference family (InferenceQueries):
  * the row hash pins cross-engine agreement; these legs pin the MATH —
  * hand-derived Welch t/df, the zero-variance bootstrap degenerate, an
  * exact planted linear model recovered with R² = 1, and the Monroe
  * log-odds z checked against an independent Scala evaluation of the
  * published formula.
  */
class InferenceSpec extends SparkSpec {

  private def run(name: String, dir: String) =
    SparkEntry.queries(name)(spark, dir)

  /** documents fixture with two hand-computable length distributions:
    *   aa: {1,2,3}   → n=3, m=2,  s²=1     → vn = 1/3
    *   bb: {2,4,6,8} → n=4, m=5,  s²=20/3  → vn = 5/3
    * Welch: t = (2−5)/√2 = −2.1213; df = 4/(1/18 + 25/27) = 4.0755. */
  private lazy val welchDir: String = {
    val d = Files.createTempDirectory("graft-welch").toString
    import spark.implicits._
    Seq((1L, "x", "aa", "s", 1L), (2L, "x", "aa", "s", 2L),
      (3L, "x", "aa", "s", 3L), (4L, "x", "bb", "s", 2L),
      (5L, "x", "bb", "s", 4L), (6L, "x", "bb", "s", 6L),
      (7L, "x", "bb", "s", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  test("welch: hand-derived t and Welch-Satterthwaite df") {
    val rows = run("q_welch_ttest", welchDir).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[String]("l1") == "aa" && r.getAs[String]("l2") == "bb")
    assert(r.getAs[Long]("n1") == 3L && r.getAs[Long]("n2") == 4L)
    assert(r.getAs[Double]("t_stat") == -2.1213) // −3/√2 under pround4
    assert(r.getAs[Double]("df") == 4.0755)
  }

  test("welch: identical groups give t = 0") {
    val d = Files.createTempDirectory("graft-welch0").toString
    import spark.implicits._
    Seq((1L, "x", "aa", "s", 3L), (2L, "x", "aa", "s", 9L),
      (3L, "x", "bb", "s", 3L), (4L, "x", "bb", "s", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val r = run("q_welch_ttest", d).collect().head
    assert(r.getAs[Double]("t_stat") == 0.0)
  }

  test("bootstrap: constant lengths give zero SE and a collapsed CI") {
    val d = Files.createTempDirectory("graft-boot").toString
    import spark.implicits._
    // every doc length 7 → every replicate mean is the exact BIGINT ratio
    // 7·Σw/Σw = 7, so the stddev over replicates is identically zero
    (1L to 9L).map(i => (i, "x", "aa", "s", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val r = run("q_bootstrap_ci", d).collect().head
    assert(r.getAs[Long]("n") == 9L)
    assert(r.getAs[Long]("nrep") == 32L,
      "all 32 Poisson replicates must draw a nonzero total weight here")
    assert(r.getAs[Double]("mean_chars") == 7.0)
    assert(r.getAs[Double]("boot_se") == 0.0)
    assert(r.getAs[Double]("ci_lo") == 7.0 && r.getAs[Double]("ci_hi") == 7.0)
  }

  test("bootstrap: SE tracks dispersion (spread lang > tight lang)") {
    val d = Files.createTempDirectory("graft-boot2").toString
    import spark.implicits._
    val tight = (1L to 20L).map(i => (i, "x", "aa", "s", 100L + (i % 2)))
    val wide = (21L to 40L).map(i => (i, "x", "bb", "s", 10L + 40L * (i % 6)))
    (tight ++ wide).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val rows = run("q_bootstrap_ci", d).collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Double]("boot_se")).toMap
    assert(rows("bb") > rows("aa"),
      s"wider distribution must bootstrap a larger SE: $rows")
    val ci = run("q_bootstrap_ci", d).collect()
      .map(r => (r.getAs[Double]("ci_lo"), r.getAs[Double]("mean_chars"),
        r.getAs[Double]("ci_hi")))
    ci.foreach { case (lo, m, hi) => assert(lo <= m && m <= hi) }
  }

  /** Exact planted linear model y = 2 + 3·x1 − x2, zero residual. */
  test("ols2: recovers the planted coefficients with r2 = 1") {
    val d = Files.createTempDirectory("graft-ols").toString
    import spark.implicits._
    import java.sql.Timestamp
    val ts = Timestamp.valueOf("2024-01-01 00:00:00")
    // (x1 views, x2 clicks) per user; y = 2 + 3·x1 − x2 purchases
    val design = Seq((1L, 1, 0, 5), (2L, 0, 1, 1), (3L, 2, 1, 7),
      (4L, 1, 2, 3), (5L, 3, 2, 9))
    var eid = 0L
    val events = design.flatMap { case (u, x1, x2, y) =>
      Seq.fill(x1)("view") ++ Seq.fill(x2)("click") ++
        Seq.fill(y)("purchase")
    }.zip(design.flatMap { case (u, x1, x2, y) =>
      Seq.fill(x1 + x2 + y)(u)
    }).map { case (tpe, u) =>
      eid += 1; (eid, ts, u, tpe, Option(1.0), "{}")
    }
    events.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    val r = run("q_ols2", d).collect().head
    assert(r.getAs[Long]("n_users") == 5L)
    assert(r.getAs[Double]("beta_views") == 3.0)
    assert(r.getAs[Double]("beta_clicks") == -1.0)
    assert(r.getAs[Double]("intercept") == 2.0)
    assert(r.getAs[Double]("r2") == 1.0)
  }

  test("log_odds: an exclusive token tops its source, z matches the formula") {
    val d = Files.createTempDirectory("graft-lo").toString
    import spark.implicits._
    // source A: "zzz zzz qq", source B: "qq qq rr" — zzz exclusive to A
    Seq((1L, "zzz zzz qq", "en", "A", 10L),
      (2L, "qq qq rr", "en", "B", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val rows = run("q_log_odds", d).collect()
    val topA = rows.filter(r => r.getAs[String]("source") == "A" &&
      r.getAs[Int]("rnk") == 1).head
    assert(topA.getAs[String]("token") == "zzz")
    // independent evaluation of the Monroe formula: yi=2, ni=3, yr=0,
    // nr=3, V=3, α=0.5
    val (yi, ni, yr, nr, v) = (2.0, 3.0, 0.0, 3.0, 3.0)
    val delta = math.log((yi + 0.5) / (ni + 0.5 * v - yi - 0.5)) -
      math.log((yr + 0.5) / (nr + 0.5 * v - yr - 0.5))
    val z = delta / math.sqrt(1.0 / (yi + 0.5) + 1.0 / (yr + 0.5))
    val expected = math.floor(z * 10000 + 0.5) / 10000
    assert(topA.getAs[Double]("z_score") == expected)
  }
}

package graft

import java.nio.file.Files

/** Planted-fixture semantics for GovernanceQueries: the fixed-seed DP
  * noise contract (data-independent, formula-exact), the k-anonymity
  * risk arithmetic, and the knapsack's density ordering + crossing rule.
  */
class GovernanceSpec extends SparkSpec {

  private def run(name: String, dir: String) =
    SparkEntry.queries(name)(spark, dir)

  private def docs(d: String, rows: Seq[(Long, String, String, String, Long)]): String = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  /** The streaming-side 48-bit md5 helper doubles as the independent
    * reference path for the noise draw. */
  private def laplace(lang: String, source: String): Double = {
    val hv = graft.streaming.StreamingSketch.hv48(s"$lang|$source")
    val u = (hv * 2 + 1).toDouble / 562949953421312.0
    val d = u - 0.5
    -math.signum(d) * math.log(1.0 - 2.0 * math.abs(d))
  }

  test("dp_counts: noise matches the inverse-CDF formula and ignores counts") {
    val d1 = docs(Files.createTempDirectory("graft-dp1").toString,
      (1L to 4L).map(i => (i, "x", "en", "web", 10L)))
    val d2 = docs(Files.createTempDirectory("graft-dp2").toString,
      (1L to 9L).map(i => (i, "x", "en", "web", 10L)))
    def one(dir: String) = run("q_dp_counts", dir).collect().head
    val (r1, r2) = (one(d1), one(d2))
    val noise = laplace("en", "web")
    def round4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    assert(r1.getAs[Long]("n") == 4L && r2.getAs[Long]("n") == 9L)
    assert(r1.getAs[Double]("n_noisy") == round4(4L + noise),
      "noise must equal the hand-evaluated Laplace inverse-CDF draw")
    assert(r2.getAs[Double]("n_noisy") == round4(9L + noise),
      "the draw is keyed by (lang, source) only — fixed-seed DP: " +
        "same group, different data, SAME offset")
  }

  test("k_anon: risky groups and row share") {
    // en/web: bucket lb=0 has 6 rows (safe), bucket lb=1 has 2 (risky)
    val d = docs(Files.createTempDirectory("graft-ka").toString,
      (1L to 6L).map(i => (i, "x", "en", "web", 50L)) ++
        Seq((7L, "x", "en", "web", 150L), (8L, "x", "en", "web", 151L)))
    val r = run("q_k_anon", d).collect().head
    assert(r.getAs[Long]("n_groups") == 2L)
    assert(r.getAs[Long]("n_risky") == 1L)
    assert(r.getAs[Long]("n_rows") == 8L)
    assert(r.getAs[Double]("risk_share") == 0.25)
  }

  test("mix_knapsack: novelty density ranks, crossing source included") {
    // A: 4 unique tokens → 2 novel shingles over 100 chars (density .02)
    // B: the SAME text → 0 novel shingles over 1000 chars (density 0)
    // C: fresh text → 2 novel shingles over 400 chars (density .005)
    val d = docs(Files.createTempDirectory("graft-knap").toString, Seq(
      (1L, "a b c d", "en", "A", 100L),
      (2L, "a b c d", "en", "B", 1000L),
      (3L, "p q r s", "en", "C", 400L)))
    val rows = run("q_mix_knapsack", d).collect()
    val byRank = rows.sortBy(_.getAs[Int]("rnk"))
    assert(byRank.map(_.getAs[String]("source")).toSeq == Seq("A", "C", "B"))
    assert(byRank.head.getAs[Long]("nv") == 2L)
    assert(byRank.last.getAs[Long]("nv") == 0L,
      "a pure duplicate source earns zero novelty credit")
    // budget: tot=1500, half=750. A(cum 100) in; C(cum 500, prev 100) in;
    // B crosses (prev 500 < 750) → included as the crossing source
    assert(byRank.map(_.getAs[Int]("included")).toSeq == Seq(1, 1, 1))
    // tighten: drop C, make B huge → B still crossing-included, so add a
    // fourth source AFTER the crossing to pin an excluded row
    val d2 = docs(Files.createTempDirectory("graft-knap2").toString, Seq(
      (1L, "a b c d", "en", "A", 100L),
      (2L, "a b c d", "en", "B", 1000L),
      (3L, "p q r s", "en", "C", 400L),
      (4L, "a b c p", "en", "D", 4000L))) // 1 novel shingle / 4000 chars
    val rows2 = run("q_mix_knapsack", d2).collect().sortBy(_.getAs[Int]("rnk"))
    assert(rows2.map(_.getAs[String]("source")).toSeq
      == Seq("A", "C", "D", "B"))
    // tot=5500, half=2750: A(100) in, C(500) in, D crosses (500<2750) in,
    // B prev-cum 4500 ≥ 2750 → EXCLUDED
    assert(rows2.map(_.getAs[Int]("included")).toSeq == Seq(1, 1, 1, 0))
  }
}

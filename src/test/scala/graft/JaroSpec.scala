package graft

import graft.functions.{JaroImpl, NativeJaro}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Pins JaroImpl to the oracle's jaro_winkler_similarity semantics. The
  * reference doubles below were read directly from DuckDB; equality is
  * BIT-exact (==, no tolerance) because the kernel reproduces the same
  * IEEE op sequence. A 3000-random-pair A/B against DuckDB (dev-side)
  * showed 0 mismatches with integer-halved transpositions — the float-
  * halved variant diverged on 199 pairs, so that choice is load-bearing.
  */
class JaroSpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    JaroImpl.jaroWinkler(UTF8String.fromString(a), UTF8String.fromString(b))

  test("kernel matches DuckDB bit-exactly on the pinned cases") {
    assert(jw("MARTHA", "MARHTA") == 0.9611111111111111)
    assert(jw("DIXON", "DICKSONX") == 0.8133333333333332)
    assert(jw("JELLYFISH", "SMELLYFISH") == 0.8962962962962964)
    assert(jw("DWAYNE", "DUANE") == 0.8400000000000001)
    assert(jw("arnab", "aranb") == 0.9466666666666665)
    assert(jw("CRATE", "TRACE") == 0.7333333333333334)
    assert(jw("abc", "abc") == 1.0)
    // either-empty → 0.0 (DuckDB semantics; NOT the both-empty=1 variant)
    assert(jw("", "") == 0.0)
    assert(jw("", "abc") == 0.0)
    // window 0 admits only same-position matches
    assert(jw("ab", "ba") == 0.0)
    // boost gate is strict: jaro 0.6 with a 4-char prefix stays unboosted
    assert(jw("abcdefghij", "abcdzzzzzz") == 0.6)
    // above the gate the l·0.1·(1-j) boost applies (l capped at 4)
    assert(jw("ab", "abcdefghijklmn") == 0.7714285714285715)
  }

  test("kernel matches DuckDB bit-exactly on non-ASCII (UTF-8 byte semantics)") {
    // the oracle measures length/window/prefix in UTF-8 BYTES — a
    // code-point or UTF-16 kernel diverges on ~70% of non-ASCII pairs
    // (probed in tools/jaro_ab.py); these pins cover 2-byte (é/ü/Greek),
    // 3-byte (CJK), and 4-byte/non-BMP (surrogate-pair) characters
    assert(jw("café", "cafe") == 0.8483333333333334)
    assert(jw("日本語", "日本語テスト") == 0.9)
    assert(jw("🦀crab", "🦀crib") == 0.95)
    assert(jw("über", "uber") == 0.7833333333333333)
    assert(jw("naïve", "naive") == 0.8577777777777779)
    assert(jw("héllo wörld", "hello world") == 0.8531468531468531)
    assert(jw("αβγδε", "αβγεδ") == 0.98)
  }

  test("SQL function registers and codegen output equals interpreted eval") {
    NativeJaro.register(spark)
    import spark.implicits._
    val df = Seq(("MARTHA", "MARHTA"), ("small ring", "smal ring"),
      ("red widget", "red widgett"), ("", "x"))
      .toDF("a", "b")
    val got = df.selectExpr("jaro_winkler(a, b) AS j").collect().map(_.getDouble(0))
    val want = Seq("MARTHA" -> "MARHTA", "small ring" -> "smal ring",
      "red widget" -> "red widgett", "" -> "x").map { case (a, b) => jw(a, b) }
    assert(got.toSeq == want)
    // expression lives inside whole-stage codegen, not a fallback project
    // (a literal Seq would constant-fold to LocalTableScan — use the
    // parquet-backed fixture so a real Project stage exists)
    table("part").createOrReplaceTempView("part_jaro")
    val plan = spark.sql(
      "SELECT jaro_winkler(p_name, p_brand) FROM part_jaro")
      .queryExecution.executedPlan.toString
    // the "*(n)" stage prefix marks WholeStageCodegen in the plan string
    assert(plan.startsWith("*("), plan)
  }

  test("q_fuzzy_pairs: ordered, scores in [0.7, 1], no self-pairs") {
    val rows = q("q_fuzzy_pairs").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("name_a") < r.getAs[String]("name_b"))
      val s = r.getAs[Double]("jw")
      assert(s >= 0.7 && s <= 1.0)
    }
  }

  test("q_fuzzy_pairs blocks on the noun: pairs share their last token") {
    q("q_fuzzy_pairs").collect().foreach { r =>
      val noun = (s: String) => s.split(" ").last
      assert(noun(r.getAs[String]("name_a")) == noun(r.getAs[String]("name_b")))
    }
  }
}

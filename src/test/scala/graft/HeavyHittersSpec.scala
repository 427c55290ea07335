package graft

import graft.functions.HeavyHitters
import org.apache.spark.sql.functions._

/** Misra–Gries sketch + two-pass exact heavy hitters
  * (functions/HeavyHitters.scala). */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  /** Zipf-ish synthetic stream with known exact counts: item i repeated
    * counts(i) times, shuffled deterministically. */
  private def stream(counts: Map[String, Int], seed: Int = 7): Seq[String] = {
    val flat = counts.toSeq.sortBy(_._1).flatMap { case (w, c) => Seq.fill(c)(w) }
    new scala.util.Random(seed).shuffle(flat)
  }

  test("MG summary contains every item above n/(k+1) with bounded undercount") {
    val counts = Map("a" -> 500, "b" -> 300, "c" -> 120,
      "d" -> 40, "e" -> 25) ++ (1 to 200).map(i => s"noise$i" -> 1).toMap
    val n = counts.values.sum
    val k = 10
    val data = stream(counts).toDF("w").repartition(7) // force multi-partition merges
    val summary = data.agg(HeavyHitters.misraGries(col("w"), k))
      .head().getMap[String, Long](0)

    assert(summary.size <= k, s"summary overflows k: ${summary.size}")
    val threshold = n.toDouble / (k + 1)
    counts.filter(_._2 > threshold).keys.foreach { w =>
      assert(summary.contains(w), s"heavy item $w missing from summary $summary")
    }
    // every reported count is a lower bound, short by at most n/(k+1)
    summary.foreach { case (w, est) =>
      val truth = counts.getOrElse(w, 0)
      assert(est <= truth, s"$w estimate $est exceeds truth $truth")
      assert(truth - est <= threshold,
        s"$w undercount ${truth - est} exceeds bound $threshold")
    }
  }

  test("exactHeavyHitters equals the brute-force groupBy/HAVING answer") {
    val counts = Map("alpha" -> 400, "beta" -> 90, "gamma" -> 55,
      "delta" -> 30) ++ (1 to 300).map(i => s"tail$i" -> 2).toMap
    val data = stream(counts).toDF("w")
    val denom = 20 // frequency strictly above 5%
    val got = HeavyHitters.exactHeavyHitters(data, "w", denom)
      .orderBy("w").as[(String, Long)].collect().toSeq

    val nTotal = counts.values.sum
    val want = counts.toSeq
      .filter { case (_, c) => c.toLong * denom > nTotal }
      .map { case (w, c) => (w, c.toLong) }
      .sortBy(_._1)
    assert(got == want, s"got $got want $want")
    // counts are EXACT (not the sketch's lower bounds)
    got.foreach { case (w, c) => assert(c == counts(w)) }
  }

  test("exact result is partitioning-independent (merge-order independence)") {
    val counts = Map("x" -> 120, "y" -> 80) ++
      (1 to 100).map(i => s"z$i" -> 3).toMap
    val base = stream(counts).toDF("w")
    val a = HeavyHitters.exactHeavyHitters(base.repartition(1), "w", 10)
      .orderBy("w").collect().toSeq
    val b = HeavyHitters.exactHeavyHitters(base.repartition(13), "w", 10)
      .orderBy("w").collect().toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("nulls are ignored; empty input yields empty result") {
    val data = Seq(Some("a"), None, Some("a"), None, Some("b"))
      .toDF("w")
    val got = HeavyHitters.exactHeavyHitters(data, "w", 2)
      .as[(String, Long)].collect().toSeq
    // n counts NON-NULL values only (round-7 advice fix: null is never a
    // candidate, so counting null rows would deflate every item's
    // frequency on a nullable column): n = 3, a: 2*2=4 > 3 qualifies,
    // b: 1*2=2 < 3 does not — were nulls still counted (n=5), a would
    // fail too, so this pins the denominator semantics
    assert(got == Seq(("a", 2L)), s"got $got")

    val empty = HeavyHitters.exactHeavyHitters(
      Seq.empty[String].toDF("w"), "w", 5)
    assert(empty.count() == 0)
  }

  test("q_heavy_hitters equals its exact formulation on the fixture") {
    val got = q("q_heavy_hitters").as[(String, Long)].collect().toSeq
    val tok = table("documents")
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
    val n = tok.count()
    val want = tok.groupBy("word").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 500 > lit(n))
      .orderBy(col("cnt").desc, col("word").asc)
      .as[(String, Long)].collect().toSeq
    assert(got == want)
    assert(got.nonEmpty, "fixture should have frequent words above 0.2%")
  }
}

package graft

import org.apache.spark.sql.functions._

/** Semantic checks for the reshape/sampling family plus the round-2 text
  * additions (q_tfidf, q_dedup_latest). */
class ReshapeSpec extends SparkSpec {

  test("q_pivot: cell counts sum back to the table count") {
    val rows = q("q_pivot").collect()
    val total = rows.map(r => r.getAs[Long]("f_cnt")
      + r.getAs[Long]("o_cnt") + r.getAs[Long]("p_cnt")).sum
    assert(total == table("orders").count())
  }

  test("q_unpivot: two rows per part, metrics invert the wide columns") {
    val rows = q("q_unpivot").collect()
    assert(rows.length == 2 * table("part").count())
    val byKey = rows.groupBy(_.getAs[Long]("p_partkey"))
    byKey.values.foreach { rs =>
      assert(rs.map(_.getAs[String]("metric")).sorted.toSeq
        == Seq("p_retailprice", "p_size"))
    }
  }

  test("q_sample_hash: deterministic across runs, plausible rate") {
    val a = q("q_sample_hash").collect().map(_.getAs[Long]("doc_id")).toSeq
    val b = q("q_sample_hash").collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(a == b, "hash sample must be stable across runs")
    val rate = a.length.toDouble / table("documents").count()
    // 26/256 ≈ 10.2% expected; wide tolerance for small fixtures
    assert(rate > 0.03 && rate < 0.25, s"suspicious sample rate $rate")
  }

  test("q_tfidf: exactly ranks 1..5 per language, scores non-increasing") {
    val rows = q("q_tfidf").collect()
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
      assert(rs.map(_.getAs[Int]("rn")).sorted.toSeq == (1 to 5),
        s"bad ranks for $lang")
      val scores = rs.sortBy(_.getAs[Int]("rn")).map(_.getAs[Double]("score"))
      assert(scores.zip(scores.tail).forall { case (x, y) => x >= y },
        s"scores not non-increasing for $lang: ${scores.toSeq}")
    }
  }

  test("q_temp_mix: min stratum keeps all, others track sqrt(n_min/n)") {
    val rows = q("q_temp_mix").collect()
      .map(r => r.getAs[String]("lang") ->
        ((r.getAs[Long]("n_total"), r.getAs[Long]("n_kept")))).toMap
    assert(rows.nonEmpty)
    val nMin = rows.values.map(_._1).min
    rows.foreach { case (lang, (n, kept)) =>
      assert(kept <= n)
      if (n == nMin) assert(kept == n, s"$lang is the min stratum, must keep all")
      else {
        val p = math.sqrt(nMin.toDouble / n)
        // md5-gate sampling noise: binomial stddev sqrt(n·p·(1−p)) — allow 5σ
        val tol = 5 * math.sqrt(n * p * (1 - p)) + 1
        assert(math.abs(kept - n * p) <= tol,
          s"$lang kept $kept of $n, expected ~${n * p} ± $tol")
      }
    }
    // the rebalance must actually flatten: the biggest stratum's kept share
    // of the total is strictly closer to uniform than its raw share
    val total = rows.values.map(_._1).sum.toDouble
    val keptTotal = rows.values.map(_._2).sum.toDouble
    val (maxLang, (maxN, maxKept)) = rows.maxBy(_._2._1)
    val uniform = 1.0 / rows.size
    assert(math.abs(maxKept / keptTotal - uniform) <
           math.abs(maxN / total - uniform),
      s"$maxLang share did not move toward uniform")
  }

  test("q_dedup_latest: one row per user, the max event_id") {
    val rows = q("q_dedup_latest").collect()
    val users = rows.map(_.getAs[Long]("user_id"))
    assert(users.distinct.length == users.length)
    val maxIds = table("events").groupBy("user_id")
      .agg(max("event_id").as("m")).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("m")).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("last_event") == maxIds(r.getAs[Long]("user_id")))
    }
  }
}

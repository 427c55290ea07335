package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Exact-semantics checks for the round-8 sketch/census operators on a
  * PLANTED fixture (the TpchGatedSpec pattern: write a tiny parquet dir
  * whose expected outputs are derivable by hand, run the registered
  * queries against it). The DuckDB oracle proves cross-engine agreement
  * at the fixture SFs; these legs pin the SEMANTICS the two engines agree
  * on — estimator formula, no-false-negative bloom property, triangle
  * census, lag-correlation edge cases — which a hash match alone can't
  * name.
  */
class SketchSpec extends SparkSpec {

  /** Planted dir: documents / events / lineitem / orders with hand-known
    * answers for each of the six round-8 queries. */
  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-sketch").toString
    import spark.implicits._

    // documents: ids 0-4 are the bloom blocklist (8 known 3-shingles);
    // doc 1 is also a containment probe fully quoted inside doc 100;
    // doc 30 carries the hand-computable Zipf distribution; docs 40/41
    // drive the KMV estimator (40 distinct tokens) and exact (10) branches.
    Seq(
      (0L, "b1 b2 b3 b4", "aa", "sBlock", 11L),
      (1L, "c1 c2 c3 c4 c5", "aa", "sProbe", 14L),
      (2L, "b5 b6 b7", "aa", "sBlock", 8L),
      (3L, "d1 d2 d3", "aa", "sBlock", 8L),
      (4L, "d4 d5 d6", "aa", "sBlock", 8L),
      (30L, "a a a a b b c", "zz", "sZipf", 13L),
      (40L, (0 until 40).map(i => s"w$i").mkString(" "), "aa", "sA", 99L),
      (41L, (0 until 10).map(i => s"v$i").mkString(" "), "aa", "sB", 29L),
      (100L, "x1 x2 c1 c2 c3 c4 c5 x3", "aa", "sCand", 23L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")

    // events: type "m" alternates its daily mean (perfect anticorrelation
    // at lag 1), type "k" is constant (zero variance → corr NULL).
    val evts = (0 until 6).flatMap { day =>
      val ts = java.sql.Timestamp.valueOf(f"2024-01-${day + 1}%02d 12:00:00")
      Seq((day.toLong * 2, ts, 1L, "m", if (day % 2 == 0) 10.0 else 0.0, "{}"),
        (day.toLong * 2 + 1, ts, 2L, "k", 5.0, "{}"))
    }
    evts.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")

    // co-purchase: urgent orders {1,2,3} and {2,3,4} → triangles (1,2,3)
    // and (2,3,4); the LOW order {5,6,7} must not contribute.
    Seq((10L, "1-URGENT"), (20L, "1-URGENT"), (30L, "5-LOW"))
      .toDF("o_orderkey", "o_orderpriority")
      .write.parquet(s"$d/orders.parquet")
    // l_linenumber/l_returnflag/l_extendedprice feed q_quantile_sketch:
    // both groups are far below k=64, so the bottom-k sample IS the
    // population and the estimate must equal the exact median.
    Seq((10L, 1L, 1, "A", 1.00), (10L, 2L, 2, "A", 2.00),
      (10L, 3L, 3, "A", 9.00), (20L, 2L, 1, "B", 5.00),
      (20L, 3L, 2, "B", 7.00), (20L, 4L, 3, "B", 6.00),
      (30L, 5L, 1, "B", 8.00), (30L, 6L, 2, "B", 4.00),
      (30L, 7L, 3, "A", 3.00))
      .toDF("l_orderkey", "l_partkey", "l_linenumber", "l_returnflag",
        "l_extendedprice")
      .write.parquet(s"$d/lineitem.parquet")
    d
  }

  private def planted(name: String) = SparkEntry.queries(name)(spark, dir)

  test("kmv: exact branch below k, estimator formula at/above k") {
    val rows = planted("q_kmv_distinct")
      .collect().map(r => r.getString(0) -> r).toMap
    // sB has 10 distinct tokens < k=16 → the exact short-circuit
    assert(rows("sB").getLong(1) == 10L && rows("sB").getDouble(2) == 10.0)
    // sA has 40 distinct tokens → estimator = 15·2^48 / 16th-smallest hash,
    // recomputed here from first principles (md5 prefix over the planted
    // vocabulary, driver-side) — pins the formula, not just determinism
    val kth = spark.range(0, 40)
      .select(conv(substring(md5(concat(lit("w"), col("id").cast("string"))
        .cast("binary")), 1, 12), 16, 10).cast("bigint").as("hv"))
      .orderBy("hv").limit(16).agg(max("hv")).head().getLong(0)
    val expected = math.floor(15.0 * 281474976710656L / kth * 10000 + 0.5) / 10000
    assert(rows("sA").getLong(1) == 40L)
    assert(rows("sA").getDouble(2) == expected)
    // sketch sanity: the estimate lands within ±4× of truth
    assert(rows("sA").getDouble(2) > 10.0 && rows("sA").getDouble(2) < 160.0)
  }

  test("bloom: no false negatives, pass = hit + fp, known hit counts") {
    val rows = planted("q_bloom_prefilter")
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    rows.values.foreach { case (_, nPass, nHit, nFp) =>
      assert(nPass == nHit + nFp, "pass must decompose into hits + FPs")
    }
    // sProbe's 3 shingles are ALL in the blocklist → a bloom filter can
    // never reject them (the no-false-negative property): pass = hit = cand
    assert(rows("sProbe") == ((3L, 3L, 3L, 0L)))
    // sCand (doc 100) quotes probe 1 → exactly its 3 c-shingles are hits
    val (nCand, _, nHit, _) = rows("sCand")
    assert(nCand == 6L && nHit == 3L)
    // blocklist sources audit clean too: every sBlock shingle passes
    assert(rows("sBlock")._3 == rows("sBlock")._1)
  }

  test("containment: fully-quoted probe scores 1.0 against its host") {
    val r = planted("q_containment")
      .filter(col("probe_id") === 1 && col("cand_id") === 100)
      .head()
    // probe 1 has 3 shingles, all inside doc 100
    assert(r.getLong(2) == 3L && r.getLong(3) == 3L && r.getDouble(4) == 1.0)
  }

  test("triangles: urgent census with exact per-node counts and ranks") {
    val got = planted("q_graph_triangles")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    // triangles (1,2,3) and (2,3,4); nodes 2,3 in both; LOW order absent
    assert(got == Seq((1, 2L, 2L), (2, 3L, 2L), (3, 1L, 1L), (4, 4L, 1L)))
  }

  test("autocorr: alternating series → -1, constant series → NULL") {
    val rows = planted("q_autocorr")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows("m").getLong(1) == 5L) // 6 days → 5 lag pairs
    assert(rows("m").getDouble(2) == -1.0)
    assert(rows("k").isNullAt(2), "zero-variance series has no correlation")
  }

  test("quantile sketch: below-k groups estimate exactly; medians by hand") {
    val rows = planted("q_quantile_sketch")
      .collect().map(r => r.getString(0) -> r).toMap
    // group A cents {100, 200, 300, 900} → median interpolates to 250;
    // group B cents {400, 500, 600, 700, 800} → 600. Both groups < k=64,
    // so the sample is the population: est must EQUAL exact
    assert(rows("A").getLong(1) == 4L && rows("B").getLong(1) == 5L)
    assert(rows("A").getDouble(3) == 250.0)
    assert(rows("B").getDouble(3) == 600.0)
    rows.values.foreach { r =>
      assert(r.getDouble(2) == r.getDouble(3),
        s"below-k sample must reproduce the exact median: $r")
    }
  }

  test("zipf: hand-computed slope and R² on a 3-word distribution") {
    // freqs 4,2,1 → points (log2 r, log2 n): (0,2), (1,1), (log2 3, 0)
    val xs = Seq(0.0, 1.0, math.log(3) / math.log(2))
    val ys = Seq(2.0, 1.0, 0.0)
    val n = 3.0
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val syy = ys.map(b => b * b).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val r2 = {
      val c = (n * sxy - sx * sy) /
        math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
      c * c
    }
    val row = planted("q_zipf_slope").filter(col("lang") === "zz").head()
    assert(row.getLong(1) == 3L)
    assert(math.abs(row.getDouble(2) - slope) < 2e-4,
      s"slope ${row.getDouble(2)} vs expected $slope")
    assert(math.abs(row.getDouble(3) - r2) < 2e-4)
  }

}

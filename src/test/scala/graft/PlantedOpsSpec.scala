package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Exact-semantics checks for the round-8 frontier/CDC/graph/quantization
  * operators on a PLANTED fixture (the SketchSpec pattern). The DuckDB
  * oracle proves the two engines agree at the fixture SFs; these legs pin
  * WHAT they agree on — strict-in-one Pareto dominance with co-surviving
  * twins, all four CDC statuses incl. the null-safe value compare, the
  * BFS hop cap and unreachable-component exclusion, and the int8
  * round-half-up/zero-vector quantization rules — none of which the real
  * fixtures exercise on every branch (e.g. sf events never produce an
  * 'added' or 'same' user).
  */
class PlantedOpsSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-planted-ops").toString
    import spark.implicits._
    import java.sql.Timestamp
    def day(n: Int) = Timestamp.valueOf(f"2024-01-$n%02d 00:00:00")

    // orders serve BOTH q_skyline (keys 1-8: minimize (price, date)) and
    // q_graph_bfs (keys 10-99: the urgent flags for the edge orders).
    // Expected frontier: 40@J25 (cheapest), 50@J20, the 100@J05 twins
    // (1, 2), the 150@J01 twins (5, 6); order 3 (100@J07, later than its
    // price group's min) and order 7 (200@J01, equal date but pricier
    // than 150) are dominated. The BFS rows price at 999@Feb — strictly
    // dominated by every skyline row, so they never pollute the frontier.
    (Seq(
      (1L, 100.0, day(5), "1-URGENT"),
      (2L, 100.0, day(5), "5-LOW"),
      (3L, 100.0, day(7), "5-LOW"),
      (4L, 50.0, day(20), "5-LOW"),
      (5L, 150.0, day(1), "1-URGENT"),
      (6L, 150.0, day(1), "5-LOW"),
      (7L, 200.0, day(1), "5-LOW"),
      (8L, 40.0, day(25), "5-LOW")) ++
      Seq(10L, 20L, 30L, 40L, 50L, 60L).map(k =>
        (k, 999.0, Timestamp.valueOf("2024-02-01 00:00:00"), "1-URGENT")) :+
      ((99L, 999.0, Timestamp.valueOf("2024-02-01 00:00:00"), "5-LOW")))
      .toDF("o_orderkey", "o_totalprice", "o_orderdate", "o_orderpriority")
      .write.parquet(s"$d/orders.parquet")

    // lineitem — BFS: urgent orders 10-50 chain parts into the path
    // 1-2-3-4-5-6 (one order per edge) plus the DISCONNECTED urgent pair
    // {8,9} (order 60); source = min part id = 1. Hops: 1→0 … 5→4;
    // part 6 is 5 hops out (beyond the cap) and 8/9 are unreachable —
    // all excluded. LOW order 99 pairs 1 with 9 and must NOT bridge.
    // Order 98 exists only in lineitem (absent from orders → invisible
    // to the urgent-join BFS) and repeats the {1,9} basket so exactly
    // one pair clears q_market_basket's n_both >= 2 support floor.
    Seq((10L, 1L), (10L, 2L), (20L, 2L), (20L, 3L), (30L, 3L), (30L, 4L),
      (40L, 4L), (40L, 5L), (50L, 5L), (50L, 6L), (60L, 8L), (60L, 9L),
      (99L, 1L), (99L, 9L), (98L, 1L), (98L, 9L))
      .toDF("l_orderkey", "l_partkey")
      .write.parquet(s"$d/lineitem.parquet")

    // events — CDC: max id 12 → cut = 6.
    //   user 1: value changes (1.0 → 2.0)         → changed
    //   user 2: type changes (b → c)              → changed
    //   user 3: no activity after the cut         → same
    //   user 4: first event after the cut         → added
    //   user 5: NULL value both sides, same type  → same (null-safe =)
    //   user 6: identical latest state            → same
    // User 6's three timestamps double as the q_gaps_islands plant: an
    // event at t0, one at EXACTLY t0+30min (touches the first interval's
    // end — must merge, the st > pmax strictness), one at t0+3h (gap →
    // second island). Everyone else's events share one ts → one island.
    val ts = Timestamp.valueOf("2024-01-01 00:00:00")
    Seq[(Long, Timestamp, Long, String, Option[Double], String)](
      (1L, ts, 1L, "a", Some(1.0), "{}"),
      (9L, ts, 1L, "a", Some(2.0), "{}"),
      (2L, ts, 2L, "b", Some(5.0), "{}"),
      (8L, ts, 2L, "c", Some(5.0), "{}"),
      (3L, ts, 3L, "d", Some(7.0), "{}"),
      (12L, ts, 4L, "e", Some(1.0), "{}"),
      (4L, ts, 5L, "f", None, "{}"),
      (10L, ts, 5L, "f", None, "{}"),
      (5L, Timestamp.valueOf("2024-01-01 06:00:00"), 6L, "g", Some(1.0), "{}"),
      (7L, Timestamp.valueOf("2024-01-01 06:30:00"), 6L, "g", Some(1.0), "{}"),
      (11L, Timestamp.valueOf("2024-01-01 09:00:00"), 6L, "g", Some(1.0), "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")

    // embeddings — int8 quantization on exact dyadic values:
    //   v0: amax 127 → scale 1.0, integer components → zero error
    //   v1: amax 254 → scale 2.0; 63.5/2 = 31.75 rounds UP to 32 →
    //       recon 64.0, err 0.25 → mse_e12 = 0.25e12 / 2 dims
    //   v2: zero vector → scale-0 guard → zero error, zero scale
    Seq(
      (0L, Array(127.0f, -64.0f, 1.0f, 0.0f), 0),
      (1L, Array(254.0f, 63.5f), 1),
      (2L, Array(0.0f, 0.0f), 2))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$d/embeddings.parquet")
    d
  }

  private def planted(name: String) = SparkEntry.queries(name)(spark, dir)

  test("skyline: strict-in-one dominance, co-surviving twins") {
    val got = planted("q_skyline").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == Seq(1L -> 100.0, 2L -> 100.0, 4L -> 50.0,
      5L -> 150.0, 6L -> 150.0, 8L -> 40.0))
  }

  test("snapshot diff: all four statuses, null-safe value compare") {
    val got = planted("q_snapshot_diff").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "changed", 2L -> "changed", 3L -> "same",
      4L -> "added", 5L -> "same", 6L -> "same"))
    // the 'added' user must carry NULL snapshot-A state
    val added = planted("q_snapshot_diff")
      .filter(col("status") === "added").head()
    assert(added.isNullAt(2) && added.isNullAt(4))
  }

  test("bfs: hop cap at 4, unreachable component excluded") {
    val got = planted("q_graph_bfs").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq
    // part 6 is 5 hops from the source and 8/9 are another component —
    // none may appear; the LOW order 99 must not bridge 1 to 9
    assert(got == Seq(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L))
  }

  test("int8 quantization: exact scale, round-half-up, zero-vector guard") {
    val got = planted("q_vec_int8").collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(0) == ((1L, 0L, 1000000000000L)))
    assert(got(1) == ((1L, 125000000000L, 2000000000000L)))
    assert(got(2) == ((1L, 0L, 0L)))
  }

  test("gaps/islands: touching intervals merge, gaps split, per-user") {
    val got = planted("q_gaps_islands").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // user 6: t0 and t0+30m TOUCH (st == prior end) → one 3600 s island;
    // t0+3h is 2.5 h past that island's end → its own 1800 s island
    assert(got(6L) == ((2L, 5400L, 3600L)))
    // single-instant users: one 30-minute island
    Seq(1L, 2L, 5L).foreach(u => assert(got(u) == ((1L, 1800L, 1800L))))
    // user 3's lone event and user 4's lone event likewise
    assert(got(3L) == ((1L, 1800L, 1800L)) && got(4L) == ((1L, 1800L, 1800L)))
  }

  test("mad outlier: rank-median arithmetic, all-identical-majority edge") {
    import spark.implicits._
    import java.sql.Timestamp
    // dedicated day-count plants (separate dir — the shared fixture has
    // a single calendar day)
    def mk(counts: Seq[Int]): String = {
      val d2 = Files.createTempDirectory("graft-mad").toString
      counts.zipWithIndex.flatMap { case (n, day) =>
        (0 until n).map { i =>
          (day.toLong * 1000 + i,
            Timestamp.valueOf(f"2024-02-${day + 1}%02d 12:00:00"),
            1L, "t", Some(1.0): Option[Double], "{}")
        }
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.parquet(s"$d2/events.parquet")
      d2
    }
    // counts (1,2,3,4,100): med_x2 = 6, devs_x2 = (4,2,0,2,194) →
    // mad_x4 = 2 + 2 = 4; 3-MAD test flags only the 100-count day
    val r1 = SparkEntry.queries("q_mad_outlier")(spark, mk(Seq(1, 2, 3, 4, 100)))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(r1.map(_._5).toSeq == Seq(0L, 0L, 0L, 0L, 1L))
    assert(r1.forall(_._4 == 4L) && r1.last._3 == 194L)
    // identical majority (10,10,10,10,100): MAD collapses to 0 and ANY
    // deviation is an outlier — the robust-stat behavior a mean/stddev
    // z-score can't reproduce (the outlier inflates its own threshold)
    val r2 = SparkEntry.queries("q_mad_outlier")(spark, mk(Seq(10, 10, 10, 10, 100)))
      .collect().map(r => (r.getString(0), r.getLong(4)))
    assert(r2.map(_._2).toSeq == Seq(0L, 0L, 0L, 0L, 1L))
  }

  test("rfm: ntile quartiles with total tiebreak, exact day/decimal math") {
    import spark.implicits._
    import java.sql.Timestamp
    val d3 = Files.createTempDirectory("graft-rfm").toString
    // 4 customers, one quartile each by construction: customer k has
    // last-order day (Jan 10 - k), k orders, and 10·k total spend
    (1 to 4).flatMap { k =>
      (1 to k).map { i =>
        (k.toLong * 100 + i, k.toLong, 10.0,
          Timestamp.valueOf(f"2024-01-${10 - k}%02d 00:00:00"))
      }
    }.toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
      .write.parquet(s"$d3/orders.parquet")
    val got = SparkEntry.queries("q_rfm")(spark, d3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getString(7)))).toMap
    // cust 1: most recent (r_days 0 → r 4), fewest orders (f 1), least
    // spend (m 1) → "411"; cust 4: oldest, most, biggest → "144"
    assert(got(1L) == ((0L, 1L, 10.0, "411")))
    assert(got(2L) == ((1L, 2L, 20.0, "322")))
    assert(got(3L) == ((2L, 3L, 30.0, "233")))
    assert(got(4L) == ((3L, 4L, 40.0, "144")))
  }

  test("market basket: support floor, exact support/confidence/lift") {
    // only {1,9} repeats (orders 98+99): N=8 baskets, n_1=3, n_9=3 →
    // support 2/8, confidence 2/3, lift 2·8/(3·3)
    val got = planted("q_market_basket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
    assert(got == Seq((1L, 9L, 2L, 0.25, 0.6667, 1.7778)))
  }

  test("attribution: last prior touch wins, organic purchases stay NULL") {
    import spark.implicits._
    import java.sql.Timestamp
    val d4 = Files.createTempDirectory("graft-attr").toString
    val ts = Timestamp.valueOf("2024-03-01 00:00:00")
    // user 1: view(1) click(2) purchase(3) purchase(4) other(5)
    //         purchase(6) — every purchase credits the CLICK (latest
    //         prior touch), never the earlier view
    // user 2: purchase(7) with no prior touch → organic (NULL attr)
    Seq((1L, "view"), (2L, "click"), (3L, "purchase"), (4L, "purchase"),
      (5L, "other"), (6L, "purchase"))
      .map { case (id, t) => (id, ts, 1L, t, Some(1.0): Option[Double], "{}") }
      .++(Seq((7L, ts, 2L, "purchase", Some(1.0): Option[Double], "{}")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d4/events.parquet")
    val got = SparkEntry.queries("q_attribution")(spark, d4).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) "organic" else r.getString(3))).toSeq
    assert(got == Seq((3L, 2L, "click"), (4L, 2L, "click"),
      (6L, 2L, "click"), (7L, -1L, "organic")))
  }

  test("ab test: pooled z arithmetic and the integer significance gate") {
    import spark.implicits._
    import java.sql.Timestamp
    val d5 = Files.createTempDirectory("graft-ab").toString
    val ts = Timestamp.valueOf("2024-03-01 00:00:00")
    // converted = >= 14 purchases. A = users {0, 2}: 14 and 1 purchases
    // → x_a = 1; B = users {1, 3}: 14 and 14 → x_b = 2.
    // p̂ = 3/4, z = (0.5 − 1.0)/√(0.75·0.25·(1/2 + 1/2)) = −1.15470…
    val rows = Seq(0L -> 14, 1L -> 14, 2L -> 1, 3L -> 14).flatMap {
      case (u, np) => (0 until np).map(i =>
        (u * 100 + i, ts, u, "purchase", Some(1.0): Option[Double], "{}"))
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d5/events.parquet")
    val r = SparkEntry.queries("q_ab_test")(spark, d5).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      == ((2L, 1L, 2L, 2L)))
    assert(r.getDouble(4) == 0.5 && r.getDouble(5) == 1.0)
    assert(r.getLong(6) == -11547L && r.getLong(7) == 0L)
  }
}

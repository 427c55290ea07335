package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Semantic checks for AggregateQueries beyond "it runs" — cross-checked
  * against independently computed values on sf0.001. */
class AggregateSpec extends SparkSpec {

  test("q_agg_global matches direct computation") {
    val r = q("q_agg_global").head()
    val li = table("lineitem")
    assert(r.getAs[Long]("cnt") == li.count())
    val directMin = li.agg(min("l_extendedprice")).head().getDouble(0)
    assert(math.abs(r.getAs[Double]("min_price") - directMin) < 1e-3)
  }

  test("q_agg_group partitions the table exactly") {
    val rows = q("q_agg_group").collect()
    assert(rows.map(_.getAs[Long]("cnt")).sum == table("lineitem").count())
    // group keys are unique
    val keys = rows.map(r => (r.getString(0), r.getString(1)))
    assert(keys.distinct.length == keys.length)
  }

  test("q_agg_having keeps only groups with cnt >= 12") {
    val rows = q("q_agg_having").collect()
    assert(rows.forall(_.getAs[Long]("cnt") >= 12))
  }

  test("q_agg_rollup has (groups + flags + 1) rows and a correct total") {
    val rows = q("q_agg_rollup").collect()
    val leaf = rows.filter(r => r.getAs[Int]("g_rf") == 0 && r.getAs[Int]("g_ls") == 0)
    val mid = rows.filter(r => r.getAs[Int]("g_rf") == 0 && r.getAs[Int]("g_ls") == 1)
    val top = rows.filter(r => r.getAs[Int]("g_rf") == 1 && r.getAs[Int]("g_ls") == 1)
    assert(top.length == 1)
    assert(rows.length == leaf.length + mid.length + 1)
    assert(top.head.getAs[Long]("cnt") == table("lineitem").count())
    assert(leaf.map(_.getAs[Long]("cnt")).sum == table("lineitem").count())
  }

  test("q_agg_cube has 4 grouping levels summing consistently") {
    val rows = q("q_agg_cube").collect()
    val total = table("orders").count()
    for ((gs, gp) <- Seq((0, 0), (0, 1), (1, 0), (1, 1))) {
      val lvl = rows.filter(r =>
        r.getAs[Int]("g_st") == gs && r.getAs[Int]("g_pr") == gp)
      assert(lvl.map(_.getAs[Long]("cnt")).sum == total,
        s"level ($gs,$gp) does not partition the table")
    }
  }

  test("q_agg_distinct per-flag distinct parts <= total parts") {
    val totalParts = table("lineitem").select("l_partkey").distinct().count()
    val rows = q("q_agg_distinct").collect()
    assert(rows.forall(_.getAs[Long]("d_parts") <= totalParts))
  }

  test("q_agg_stats stddev^2 == variance (rounded)") {
    q("q_agg_stats").collect().foreach { r =>
      val sd = r.getAs[Double]("sd_qty"); val v = r.getAs[Double]("var_qty")
      assert(math.abs(sd * sd - v) < 0.01, s"sd^2=$v mismatch in $r")
    }
  }

  test("q_agg_collect list length equals cnt; sets are deduped") {
    // outputs are '|'-serialized sorted lists (driver comparator can't
    // sort/hash array cells)
    q("q_agg_collect").collect().foreach { r =>
      val names = r.getAs[String]("names").split('|').toSeq
      assert(names.length == r.getAs[Long]("cnt"))
      val segs = r.getAs[String]("segs").split('|').toSeq
      assert(segs.distinct.length == segs.length)
      assert(segs == segs.sorted)
    }
  }

  test("q_agg_gsets subtotals are consistent") {
    val rows = q("q_agg_gsets").collect()
    val leaf = rows.filter(r => r.getAs[Int]("g_et") == 0 && r.getAs[Int]("g_uid") == 0)
    val byType = rows.filter(r => r.getAs[Int]("g_et") == 0 && r.getAs[Int]("g_uid") == 1)
    val grand = rows.filter(r => r.getAs[Int]("g_et") == 1 && r.getAs[Int]("g_uid") == 1)
    assert(grand.length == 1)
    assert(grand.head.getAs[Long]("cnt") == table("events").count())
    assert(byType.map(_.getAs[Long]("cnt")).sum == grand.head.getAs[Long]("cnt"))
    assert(leaf.map(_.getAs[Long]("cnt")).sum == grand.head.getAs[Long]("cnt"))
  }
}

package graft

import org.apache.spark.sql.functions.col

/** Contract checks over the whole registry: every query runs on sf0.001,
  * returns rows, and every oracle key has a matching query. */
class RegistrySpec extends SparkSpec {

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without a query: $missing")
  }

  test("no duplicate query ids across modules") {
    // flatMap.toMap silently drops dups — count through the module list.
    val all = Seq(
      operators.TextQueries, operators.RelationalQueries,
      operators.JoinQueries, operators.AggregateQueries,
      operators.WindowQueries, operators.FunctionQueries,
      operators.DedupQueries, operators.TextStatsQueries,
      operators.SimilarityQueries, operators.ReshapeQueries,
      operators.SubqueryQueries, operators.TextPipelineQueries,
      operators.PipelineQueries, operators.TpchQueries,
      operators.TimeSeriesQueries, operators.ProfileQueries)
      .flatMap(_.queries.keys)
    val dups = all.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query ids: $dups")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for ((name, _) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs and returns rows on sf0.001") {
      val df = q(name)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("q_intersect_all / q_except_all: multiset counts are min and difference") {
    val li = table("lineitem")
    val a = li.filter(col("l_orderkey") % 2 === 0)
      .groupBy("l_returnflag", "l_linestatus").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val b = li.filter(col("l_orderkey") % 2 === 1)
      .groupBy("l_returnflag", "l_linestatus").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val inter = q("q_intersect_all").collect()
      .groupBy(r => (r.getString(0), r.getString(1))).view.mapValues(_.length.toLong).toMap
    val exc = q("q_except_all").collect()
      .groupBy(r => (r.getString(0), r.getString(1))).view.mapValues(_.length.toLong).toMap
    (a.keySet ++ b.keySet).foreach { k =>
      val (na, nb) = (a.getOrElse(k, 0L), b.getOrElse(k, 0L))
      assert(inter.getOrElse(k, 0L) == math.min(na, nb), s"intersectAll $k")
      assert(exc.getOrElse(k, 0L) == math.max(na - nb, 0L), s"exceptAll $k")
    }
  }
}

package graft

import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {

  test("q_pagerank: mass conserved (~1), every node positive") {
    val rows = q("q_pagerank").collect()
    assert(rows.length >= 2)
    val total = rows.map(_.getAs[Double]("pr")).sum
    // no dangling nodes in a looping transition graph → Σpr ≈ 1 up to
    // the 1e-14 scaling and the final 4-decimal round
    assert(math.abs(total - 1.0) < 0.01, s"mass $total")
    assert(rows.forall(_.getAs[Double]("pr") > 0))
  }

  test("q_pagerank: a sink-heavier node outranks the uniform start") {
    val rows = q("q_pagerank").collect()
    val prs = rows.map(r => r.getAs[String]("node") -> r.getAs[Double]("pr"))
    // iteration must have moved SOME mass (not the uniform vector)
    assert(prs.map(_._2).distinct.length > 1)
  }

  test("q_graph_degree: in- and out-mass both equal total transitions") {
    val rows = q("q_graph_degree").collect()
    val transitions = {
      val ev = table("events")
      ev.count() - ev.select("user_id").distinct().count()
    }
    assert(rows.map(_.getAs[Long]("out_n")).sum === transitions)
    assert(rows.map(_.getAs[Long]("in_n")).sum === transitions)
    rows.foreach { r =>
      assert(r.getAs[Long]("self_n") <= r.getAs[Long]("out_n"))
    }
  }
}

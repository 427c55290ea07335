package graft.operators

import graft.QueryModule
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.3 B/D extensions — subquery forms. The reference surface
  * exposes filter-vs-aggregate queries (compare each row against a computed
  * aggregate); in Spark the scale-correct shapes are:
  *
  *   - q_scalar_subquery: `WHERE x > (SELECT agg FROM …)` — the aggregate is
  *     a single-row relation, so the filter becomes a BROADCAST cross join
  *     (one extra stage, no shuffle of the big side). Never collect() the
  *     scalar to the driver: keeping it in-plan lets AQE reuse the exchange
  *     and keeps the query one job.
  *   - q_correlated_agg: `WHERE x > (SELECT agg … WHERE key = outer.key)` —
  *     the classic correlated scalar subquery, decorrelated to a window
  *     aggregate over the correlation key (exactly what Catalyst's
  *     decorrelation rewrite produces): one Exchange on o_custkey instead of
  *     a per-row subquery execution.
  *
  * Determinism: both averages are exact DECIMAL(18,4) sums divided once as
  * DOUBLE (identical operands + one identical IEEE division on both
  * engines), so the `>` threshold can never flake on accumulation order.
  */
object SubqueryQueries extends QueryModule {

  override def queries: Map[String, Q] = Map(
    "q_scalar_subquery" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val g = c.agg(
        (sum(col("c_acctbal").cast("decimal(18,4)")).cast("double")
          / count(lit(1))).as("gavg"))
      c.crossJoin(broadcast(g))
        .filter(col("c_acctbal") > col("gavg"))
        .select(col("c_custkey"), round(col("c_acctbal"), 4).as("acctbal"))
        .orderBy("c_custkey")
    }),

    "q_correlated_agg" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
      t(s, dir, "orders")
        .withColumn("cavg",
          sum(col("o_totalprice").cast("decimal(18,4)")).over(w)
            .cast("double") / count(lit(1)).over(w))
        .filter(col("o_totalprice") > col("cavg"))
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 4).as("price"))
        .orderBy("o_orderkey")
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "q_scalar_subquery" ->
      """SELECT c_custkey, ROUND(c_acctbal, 4) AS acctbal FROM customer
        |WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
        |                          / COUNT(*) FROM customer)
        |ORDER BY c_custkey""".stripMargin,

    "q_correlated_agg" ->
      """SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 4) AS price
        |FROM orders o
        |WHERE o_totalprice > (SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |                             / COUNT(*)
        |                      FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin
  )
}

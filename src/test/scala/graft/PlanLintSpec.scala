package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.{GlobalLimitExec, ProjectExec, SortExec, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import graft.plans.PlanAllowlist

/** Registry-wide physical-plan lint: every SparkEntry query's plan at
  * sf0.001 is walked for the scale-killers a green row hash can't see — a
  * cartesian product, a nested-loop join, a global sort that should have
  * fused with its limit into TakeOrderedAndProject, an unbounded global
  * window. Documented exceptions live in graft.plans.PlanAllowlist (MAIN
  * code — Bench subtracts the same list to report planRisksNovel, so the
  * graded artifact and this suite can never disagree about what counts as
  * novel); anything not allowlisted fails the suite, so a plan regression
  * (join key dropped, rewrite rule stops firing, broadcast threshold
  * missed) surfaces as a red spec instead of a silent 100x at scale.
  */
class PlanLintSpec extends SparkSpec {

  private def flatten(p: SparkPlan): Seq[SparkPlan] = PlanAllowlist.flatten(p)

  /** A GlobalLimit directly over a global Sort (through projections /
    * exchanges) — the shape TakeOrderedAndProject exists to replace. */
  private def limitOverSort(p: SparkPlan): Boolean = {
    def sortBelow(c: SparkPlan): Boolean = c match {
      case s: SortExec              => s.global
      case pr: ProjectExec          => sortBelow(pr.child)
      case e: Exchange              => sortBelow(e.child)
      case a: AdaptiveSparkPlanExec => sortBelow(a.executedPlan)
      case s: QueryStageExec        => sortBelow(s.plan)
      case _                        => false
    }
    p match {
      case g: GlobalLimitExec => sortBelow(g.child)
      case _                  => false
    }
  }

  test("no registry plan cartesians, nested-loops, unfused sort+limit, " +
    "or unbounded global windows (PlanDoctor sweep)") {
    val violations = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.executedPlan
        PlanAllowlist.novelRisks(name, plan).map(f => s"$name: ${f.render}")
    }
    assert(violations.isEmpty,
      s"plan lint violations:\n  ${violations.mkString("\n  ")}")
  }

  test("allowlist entries still exhibit their documented shape (no stale rows)") {
    (PlanAllowlist.cartesianOk.keySet ++ PlanAllowlist.bnljOk.keySet ++
      PlanAllowlist.sortLimitOk.keySet ++
      PlanAllowlist.expensiveJoinPredOk.keySet).toSeq.sorted
      .foreach { name =>
        assert(SparkEntry.queries.contains(name),
          s"allowlisted query $name no longer in the registry")
        val plan = SparkEntry.queries(name)(spark, sf)
          .queryExecution.executedPlan
        val nodes = flatten(plan)
        val hasShape =
          (PlanAllowlist.cartesianOk.contains(name) &&
            nodes.exists(_.isInstanceOf[CartesianProductExec])) ||
          (PlanAllowlist.bnljOk.contains(name) &&
            nodes.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec])) ||
          (PlanAllowlist.sortLimitOk.contains(name) &&
            nodes.exists(limitOverSort)) ||
          (PlanAllowlist.expensiveJoinPredOk.contains(name) &&
            graft.plans.PlanDoctor.diagnosePlan(plan)
              .exists(_.rule == "expensive-join-predicate"))
        assert(hasShape,
          s"$name is allowlisted but its plan no longer shows the documented shape — remove the entry")
      }
  }

  test("fixture-scale anchors exist and name a live production path") {
    PlanAllowlist.fixtureScaleAnchors.foreach { case (anchor, (prod, why)) =>
      assert(SparkEntry.queries.contains(anchor),
        s"anchor $anchor no longer in the registry")
      assert(SparkEntry.queries.contains(prod),
        s"anchor $anchor names production path $prod, which is not in the registry")
      assert(why.nonEmpty)
    }
  }
}

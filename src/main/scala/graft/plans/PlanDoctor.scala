package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, FilterExec, GlobalLimitExec, LocalTableScanExec, ProjectExec, SortExec, SparkPlan, TakeOrderedAndProjectExec, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}

/** Physical-plan scale diagnostics as a LIBRARY API — the engine's own
  * "would this survive 100 TB?" reviewer. The per-query checks the test
  * suite has enforced since round 6 (PlanLintSpec) live here now, so a
  * user can run them on THEIR queries:
  *
  *   PlanDoctor.diagnose(df).foreach(f => log.warn(f.render))
  *
  * Rules (risk = a scale-killer shape, warn = worth a look):
  *   - cartesian-product (risk): an O(n·m) join with no key.
  *   - nested-loop-join (risk): BroadcastNestedLoopJoin whose build side
  *     is NOT provably one row — the scalar-subquery-as-join shape (a
  *     global aggregate broadcast) is fine and excluded.
  *   - unfused-sort-limit (risk): a GlobalLimit over a global Sort that
  *     did not fuse into TakeOrderedAndProject — a full sort of the
  *     corpus to keep k rows.
  *   - global-window (risk): a WindowExec with NO partition keys whose
  *     input subtree contains no aggregate/limit — every row moves to
  *     ONE partition. Unpartitioned windows over already-aggregated
  *     (calendar/alphabet/entity-bounded) relations do not fire.
  *   - filter-not-pushed (warn): a Filter sits over a parquet scan that
  *     pushed NO predicates — pushdown-ineligible expressions (UDFs,
  *     regex on the hot path) often hide here.
  *   - expensive-join-predicate (risk): a join CONDITION contains an
  *     expensive expression (edit-distance DP, a lambda HOF, a UDF, a
  *     graft native kernel). Catalyst pushes post-join filters into the
  *     join condition and PREPENDS them, so the expensive verify runs on
  *     every key-colliding row pair BEFORE the cheap conjuncts — measured
  *     20x on q_editdist_pairs before round 9 moved its verify behind a
  *     per-pair aggregate (filters never push through aggregates).
  *   - interpreted-stage (warn): a Project/Filter executing OUTSIDE
  *     whole-stage codegen — a CodegenFallback expression broke the
  *     fused pipeline.
  *
  * Findings are advisory: the engine's own registry keeps a small named
  * allowlist in its spec (deliberate tiny-dim crosses, bounded probe
  * broadcasts) — the point is that every exception is WRITTEN DOWN.
  */
object PlanDoctor {

  final case class Finding(rule: String, severity: String, node: String,
                           detail: String) {
    def render: String = s"[$severity] $rule at $node — $detail"
  }

  /** Diagnose the plan AS CURRENTLY RESOLVED. Before any action runs,
    * an AQE query reports its initial (pre-replan) physical plan; after
    * an action, the same traversal sees the final adaptive plan (the
    * walk resolves through AdaptiveSparkPlanExec.executedPlan). For the
    * what-actually-ran verdict, prefer [[diagnoseExecuted]]. */
  def diagnose(df: DataFrame): Seq[Finding] =
    diagnosePlan(df.queryExecution.executedPlan)

  /** Diagnose what AQE ACTUALLY EXECUTED: force THIS df's physical plan
    * to its final adaptive form by running `action`, then walk that
    * final plan. The difference from [[diagnose]] matters exactly when
    * AQE re-plans at runtime — a sort-merge join demoted to broadcast on
    * observed stats, a skew join split — shapes invisible in the
    * pre-execution plan (PlanDoctorSpec pins a pre/post divergence on
    * such a join).
    *
    * The default action executes the df's OWN QueryExecution
    * (`toRdd.count()`, distributed, no driver data). `df.count()` would
    * NOT work: Dataset.count plans a SEPARATE aggregate query and leaves
    * this df's adaptive plan untouched — the subtle trap this default
    * exists to hide. `collect()`-style Dataset actions that go through
    * `withAction` on the df's own queryExecution also finalize it. */
  def diagnoseExecuted(df: DataFrame,
      action: DataFrame => Unit =
        d => { d.queryExecution.toRdd.count(); () }): Seq[Finding] = {
    action(df)
    diagnosePlan(df.queryExecution.executedPlan)
  }

  /** Expressions whose per-evaluation cost makes them join-condition
    * hazards: O(n·m) string DPs, interpreted lambda HOFs, UDFs, and the
    * engine's own native kernels (cheap per call, but a kernel in a join
    * condition means a verify ran before the cheap conjuncts — and gets
    * re-evaluated in the projection above). Simple comparisons, hashes,
    * and bit ops (xor + bit_count verifies) stay out — those are the
    * predicates that BELONG in conditions. */
  private def expensiveExpr(
      e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean =
    e match {
      case _: org.apache.spark.sql.catalyst.expressions.Levenshtein => true
      case _: org.apache.spark.sql.catalyst.expressions.HigherOrderFunction => true
      case _: org.apache.spark.sql.catalyst.expressions.ScalaUDF => true
      case other => other.getClass.getName.startsWith("graft.")
    }

  def diagnosePlan(plan: SparkPlan): Seq[Finding] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Finding]
    // reused exchanges/stages alias subtrees — visit each NODE once so a
    // plan with two distinct identical-shaped risks still counts 2, but
    // an aliased subtree counts once
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
    // whole-stage codegen only exists AFTER collapse; an AQE plan that
    // has not executed yet carries none, and flagging every Project in it
    // as "interpreted" would be pure noise — only judge codegen coverage
    // when the plan actually shows codegen stages
    val hasCodegen = {
      def any(p: SparkPlan): Boolean = p match {
        case _: WholeStageCodegenExec => true
        case a: AdaptiveSparkPlanExec => any(a.executedPlan)
        case s: QueryStageExec => any(s.plan)
        case other => other.children.exists(any) ||
          other.subqueries.exists(any)
      }
      any(plan)
    }

    // In an EXECUTED adaptive plan a broadcast build side often appears as
    // a ReusedExchangeExec — a LEAF that aliases another stage's exchange.
    // Without resolving through it, the scalar-aggregate build sides that
    // are fine in the initial plan would be flagged after execution
    // (observed: q_pagerank/q_mad_outlier/q_merge_upsert false positives).
    def bounded(p: SparkPlan): Boolean = p match {
      case _: BaseAggregateExec => true
      case _: TakeOrderedAndProjectExec => true
      case g: GlobalLimitExec => true
      case l: LocalTableScanExec => true
      case a: AdaptiveSparkPlanExec => bounded(a.executedPlan)
      case s: QueryStageExec => bounded(s.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        bounded(r.child)
      case other => other.children.exists(bounded)
    }

    def singleRow(p: SparkPlan): Boolean = p match {
      case a: BaseAggregateExec => a.groupingExpressions.isEmpty
      case t: TakeOrderedAndProjectExec => t.limit <= 1
      case g: GlobalLimitExec => g.limit <= 1
      case l: LocalTableScanExec => l.rows.lengthCompare(1) <= 0
      case a: AdaptiveSparkPlanExec => singleRow(a.executedPlan)
      case s: QueryStageExec => singleRow(s.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        singleRow(r.child)
      case other if other.children.size == 1 => singleRow(other.children.head)
      case _ => false
    }

    def sortBelow(c: SparkPlan): Boolean = c match {
      case s: SortExec => s.global
      case pr: ProjectExec => sortBelow(pr.child)
      case e: Exchange => sortBelow(e.child)
      case a: AdaptiveSparkPlanExec => sortBelow(a.executedPlan)
      case s: QueryStageExec => sortBelow(s.plan)
      case _ => false
    }

    def scanBelow(c: SparkPlan): Option[FileSourceScanExec] = c match {
      case f: FileSourceScanExec => Some(f)
      case pr: ProjectExec => scanBelow(pr.child)
      case w: WholeStageCodegenExec => scanBelow(w.child)
      case i: org.apache.spark.sql.execution.InputAdapter => scanBelow(i.child)
      case cr: org.apache.spark.sql.execution.ColumnarToRowExec =>
        scanBelow(cr.child)
      case _ => None
    }

    def walk(p: SparkPlan, inCodegen: Boolean): Unit = {
      if (!seen.add(p)) return
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan, inCodegen)
        case s: QueryStageExec => walk(s.plan, inCodegen)
        case w: WholeStageCodegenExec =>
          w.children.foreach(walk(_, inCodegen = true))
        case i: org.apache.spark.sql.execution.InputAdapter =>
          // the explicit codegen BOUNDARY: below it runs interpreted
          i.children.foreach(walk(_, inCodegen = false))
        case _ =>
          p match {
            case c: CartesianProductExec =>
              out += Finding("cartesian-product", "risk", c.nodeName,
                "keyless join is O(left x right); add a join key or " +
                  "broadcast a provably tiny side")
            case b: BroadcastNestedLoopJoinExec =>
              val build = b.buildSide match {
                case BuildLeft => b.left
                case BuildRight => b.right
              }
              if (!singleRow(build))
                out += Finding("nested-loop-join", "risk", b.nodeName,
                  "build side is not provably one row; every stream row " +
                    "scans the whole broadcast")
            case g: GlobalLimitExec
              if sortBelow(g.child) =>
              out += Finding("unfused-sort-limit", "risk", g.nodeName,
                "global sort feeding a limit did not fuse into " +
                  "TakeOrderedAndProject — the corpus is fully sorted " +
                  "to keep k rows")
            case w: WindowExec if w.partitionSpec.isEmpty =>
              if (!bounded(w.child))
                out += Finding("global-window", "risk", w.nodeName,
                  "unpartitioned window over a non-aggregated input " +
                    "moves every row to one partition; aggregate first " +
                    "or use two-phase range ranks")
            case f: FilterExec =>
              scanBelow(f.child).foreach { scan =>
                // pushedDownFilters is protected; the rendered metadata
                // carries the same list
                val pushed = scan.metadata.getOrElse("PushedFilters", "[]")
                if (pushed == "[]")
                  out += Finding("filter-not-pushed", "warn", f.nodeName,
                    s"filter over ${scan.nodeName} pushed no predicates " +
                      "into the scan — check for pushdown-ineligible " +
                      "expressions")
              }
            case _ => ()
          }
          p match {
            case j: org.apache.spark.sql.execution.joins.BaseJoinExec =>
              j.condition.toSeq
                .flatMap(c => c.collect {
                  case e if expensiveExpr(e) => e.getClass.getSimpleName
                }).distinct match {
                case Nil => ()
                case names =>
                  out += Finding("expensive-join-predicate", "risk",
                    j.nodeName,
                    s"join condition evaluates ${names.mkString(", ")} per " +
                      "key-colliding row pair (pushed filters run BEFORE " +
                      "cheap conjuncts) — verify behind a per-pair " +
                      "aggregate or Materialize barrier instead")
              }
            case _ => ()
          }
          p match {
            case _: ProjectExec | _: FilterExec
              if !inCodegen && hasCodegen =>
              out += Finding("interpreted-stage", "warn", p.nodeName,
                "row-at-a-time execution outside whole-stage codegen — " +
                  "a CodegenFallback expression broke the fused pipeline")
            case _ => ()
          }
          p.children.foreach(walk(_, inCodegen))
          p.subqueries.foreach(walk(_, inCodegen = false))
      }
    }

    walk(plan, inCodegen = false)
    out.toSeq
  }
}

package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Coalesce, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions._

/** Materialized-rollup rewrite — the classic 100 TB accelerator: a fact
  * table's common aggregates are precomputed ONCE into a small rollup of
  * partial aggregates (per-group count / sum / min / max), and matching
  * queries are rewritten by an optimizer rule to RE-AGGREGATE the rollup
  * instead of scanning the fact table. A petabyte fact scan becomes a
  * kilobyte rollup scan for every dashboard-shaped query, because count,
  * sum, min and max are re-aggregable: any grouping that is a SUBSET of
  * the rollup's grouping folds partials exactly (sum of partial sums,
  * sum of partial counts, min of mins, max of maxes).
  *
  * Scope (v1, deliberately conservative — a miss means "scan the fact
  * table", never a wrong answer):
  *   - the Aggregate's child must be the registered fact plan (modulo
  *     attribute-only Projects; compared with canonicalized sameResult);
  *   - grouping keys: plain columns, a subset of the rollup's keys;
  *   - aggregates: non-distinct, unfiltered sum / min / max over
  *     registered measure columns, and count(1)/count(*) — each rebuilt
  *     with `withNewChildren` so eval modes carry over, and only rewritten
  *     when the re-aggregated type is IDENTICAL to the original (this
  *     rejects decimal sums, whose re-aggregation widens the type);
  *   - sum over float/double re-associates partial additions — register
  *     integral measures when bit-exact results are required (the specs
  *     do; the DuckDB-oracle queries never pass through this rule's
  *     registry, which is per-session and starts empty).
  * Output attribute exprIds are preserved via aliases, so parent plans
  * resolve untouched.
  *
  * The registered rollup is MATERIALIZED at registration (localCheckpoint
  * here; a production deployment registers a read-back of the written
  * rollup table) — both so the fact scan is actually avoided and so the
  * rollup's own defining Aggregate cannot recursively match the rule.
  */
object RollupRewrite extends Rule[LogicalPlan] {

  /** One registered rollup: the fact plan it answers for, the
    * materialized rollup plan, and the column contract. */
  private final case class Entry(fact: LogicalPlan, rollup: LogicalPlan,
                                 groupCols: Seq[String], sumCols: Seq[String],
                                 minCols: Seq[String], maxCols: Seq[String]) {
    def rollupAttr(name: String): Attribute =
      rollup.output.find(_.name == name).getOrElse(
        throw new IllegalStateException(s"rollup misses column $name"))
  }

  private val entries =
    new java.util.concurrent.CopyOnWriteArrayList[Entry]()

  private val rewrites = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Number of Aggregates rewritten so far this session — lets a spec
    * prove the rule actually FIRED for a query (a silent fall-through to
    * the fact scan is correct but defeats the point). */
  def rewriteCount: Long = rewrites.get()

  /** Partial-aggregate rollup of `fact`: per-group `__cnt`, `__sum_c`,
    * `__min_c`, `__max_c`. The relation a deployment writes as a table. */
  def build(fact: DataFrame, groupCols: Seq[String], sumCols: Seq[String],
            minCols: Seq[String] = Nil, maxCols: Seq[String] = Nil): DataFrame = {
    require(groupCols.nonEmpty, "rollup needs at least one group column")
    val aggs = count(lit(1)).as("__cnt") +:
      (sumCols.map(c => sum(col(c)).as(s"__sum_$c")) ++
        minCols.map(c => min(col(c)).as(s"__min_$c")) ++
        maxCols.map(c => max(col(c)).as(s"__max_$c")))
    fact.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Build, materialize, and register a rollup for `fact`; returns the
    * materialized rollup (also the relation to persist for reuse across
    * sessions). Attaches the rule to the session idempotently. */
  def register(fact: DataFrame, groupCols: Seq[String], sumCols: Seq[String],
               minCols: Seq[String] = Nil, maxCols: Seq[String] = Nil): DataFrame = {
    val rollup = graft.functions.Materialize(
      build(fact, groupCols, sumCols, minCols, maxCols))
    entries.add(Entry(fact.queryExecution.analyzed,
      rollup.queryExecution.analyzed, groupCols, sumCols, minCols, maxCols))
    attach(fact.sparkSession)
    rollup
  }

  /** Drop every registered rollup (the rule stays attached but matches
    * nothing — test hygiene). */
  def clear(): Unit = entries.clear()

  /** Idempotently attach the rule to a live session (the cluster path is
    * `spark.sql.extensions=graft.functions.GraftExtensions`). */
  def attach(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(RollupRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RollupRewrite

  /** Attribute-only Projects are column pruning, not semantics — strip
    * them before comparing against the registered fact plan. */
  private def stripProjects(p: LogicalPlan): LogicalPlan = p match {
    case Project(ps, child) if ps.forall(_.isInstanceOf[AttributeReference]) =>
      stripProjects(child)
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (entries.isEmpty) return plan
    plan.transform {
      case agg @ Aggregate(groupings, aggExprs, child, _)
          if groupings.forall(_.isInstanceOf[AttributeReference]) =>
        val base = stripProjects(child)
        val it = entries.iterator()
        var out: LogicalPlan = agg
        var done = false
        while (it.hasNext && !done) {
          val e = it.next()
          if (base.sameResult(stripProjects(e.fact)) &&
            groupings.forall(g =>
              e.groupCols.contains(g.asInstanceOf[AttributeReference].name))) {
            rewrite(agg, e).foreach { r => out = r; done = true }
          }
        }
        out
    }
  }

  /** None = some aggregate isn't covered → leave the plan untouched. */
  private def rewrite(agg: Aggregate, e: Entry): Option[LogicalPlan] = {
    val newGroupings = agg.groupingExpressions.map {
      case a: AttributeReference => e.rollupAttr(a.name)
    }
    val newAggs: Seq[Option[NamedExpression]] = agg.aggregateExpressions.map {
      // group-key passthrough keeps its exprId via an alias
      case a: AttributeReference if e.groupCols.contains(a.name) =>
        Some(Alias(e.rollupAttr(a.name), a.name)(exprId = a.exprId))
      case al @ Alias(ae: AggregateExpression, _)
          if !ae.isDistinct && ae.filter.isEmpty =>
        val rebuilt: Option[Expression] = ae.aggregateFunction match {
          case s @ Sum(a: AttributeReference, _) if e.sumCols.contains(a.name) =>
            Some(ae.copy(aggregateFunction =
              s.withNewChildren(Seq(e.rollupAttr(s"__sum_${a.name}")))
                .asInstanceOf[Sum]))
          case m @ Min(a: AttributeReference) if e.minCols.contains(a.name) =>
            Some(ae.copy(aggregateFunction =
              m.withNewChildren(Seq(e.rollupAttr(s"__min_${a.name}")))
                .asInstanceOf[Min]))
          case m @ Max(a: AttributeReference) if e.maxCols.contains(a.name) =>
            Some(ae.copy(aggregateFunction =
              m.withNewChildren(Seq(e.rollupAttr(s"__max_${a.name}")))
                .asInstanceOf[Max]))
          case Count(Seq(Literal(v, _))) if v != null =>
            // count(1)/count(*) → sum of partial counts; coalesce pins the
            // empty-relation global aggregate to 0 and non-nullability.
            // count(lit(null)) must stay un-rewritten: it counts NOTHING,
            // not the group size.
            Some(Coalesce(Seq(
              Sum(e.rollupAttr("__cnt")).toAggregateExpression(),
              Literal(0L))))
          case _ => None
        }
        rebuilt
          .filter(r => r.dataType == al.dataType && r.nullable == al.nullable)
          .map(r => Alias(r, al.name)(exprId = al.exprId))
      case _ => None
    }
    if (newAggs.exists(_.isEmpty)) None
    else {
      rewrites.incrementAndGet()
      Some(Aggregate(newGroupings, newAggs.map(_.get), e.rollup))
    }
  }
}

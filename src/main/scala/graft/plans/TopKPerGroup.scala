package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression, GenericInternalRow, IntegerLiteral, JoinedRow, LessThan, LessThanOrEqual, NamedExpression, RowNumber, SortOrder, UnsafeProjection, UnsafeRow, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode, LazilyGeneratedOrdering}
import org.apache.spark.sql.catalyst.expressions.AttributeSet
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, UnaryNode, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{CodegenSupport, SparkPlan, UnaryExecNode}

/** Grouped top-k as a FIRST-CLASS operator — the full custom-operator
  * stack (logical node → optimizer rewrite → planner strategy → physical
  * exec) the builder guide reserves for semantics the built-in operators
  * express suboptimally.
  *
  * The declarative form users write,
  * {{{ row_number().over(partitionBy(g).orderBy(o)) <= k }}},
  * plans as Window: a full shuffle of EVERY row to its group partition,
  * a full per-partition SORT of every row, then the filter throws all but
  * k·|groups| rows away. This operator computes the same relation with a
  * bounded heap per group: a partial pass keeps ≤ k rows per (group,
  * input-partition) BEFORE the exchange — the shuffle then carries at
  * most k·|groups|·|partitions| rows instead of the corpus, and nothing
  * is ever globally sorted. Same two-phase shape as partial aggregation;
  * at 100 TB the map-side cut is the difference between shuffling
  * terabytes and shuffling megabytes.
  *
  * Spark 4's own InferWindowGroupLimit covers the same pattern with
  * sort-based Partial/Final WindowGroupLimitExec nodes — but those SORT
  * every input partition (O(n log n)) before bounding, twice. The heap
  * phases do O(n log k) with no sort at all; the rewrite strips the
  * native pre-bound when it has already been inserted. Measured on
  * sf0.1 lineitem, top-3 per l_suppkey (~40k groups), local[32]:
  * native 1.29 s vs heap 0.55 s median (2.3×).
  *
  * Correctness contract (RewriteTopKWindow only fires when all hold):
  *   - single row_number() window expression over the Filter's child;
  *   - filter condition is rn <= k or rn < k+1 with a literal k;
  *   - the Filter node is LEFT IN PLACE above the rewritten node (it
  *     re-checks rn ≤ k — a no-op — so any pattern the rewrite
  *     mis-judged would fail closed, not return wrong rows);
  *   - ties: row_number over a non-unique order is nondeterministic in
  *     the Window form too — the heap form is no worse; use a unique
  *     tiebreaker as everywhere else in this repo.
  *
  * MEMORY MODEL (the operator's cardinality assumption): each task holds
  * one k-row heap per distinct group key seen in its partition — O(groups
  * × k) rows, i.e. the same envelope as the operator's own OUTPUT per
  * partition, with no spill path (the native Window instead external-sorts
  * with spilling). That is the right trade whenever k·|groups| is
  * result-set-sized — the top-k-per-group queries this rewrite targets.
  * For a pathological key (row_number over a near-unique partition key,
  * |groups| ≈ |rows|) the heap map approaches input size: keep the native
  * plan there (don't install the rewrite, or uninstall around the query).
  * The production hardening lever, if that shape ever matters, is the
  * HashAggregateExec precedent: an UnsafeFixedWidthAggregationMap-style
  * spill-to-sort fallback.
  */
case class GroupedTopK(
    groupExprs: Seq[Expression],
    sortOrders: Seq[SortOrder],
    k: Int,
    rnAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rnAttr
  override def producedAttributes: AttributeSet = AttributeSet(rnAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupedTopK =
    copy(child = newChild)
}

/** The per-partition bounded-heap state, shared by the exec's iterator path
  * (doExecute) and its whole-stage-codegen path (generated code calls
  * insert() per row, then drains result()). Per group: a max-heap (reversed
  * ordering) of the k first-in-order rows — the heap root is the WORST kept
  * row, evicted on a better one. Initial capacity is NOT k: a defensive
  * huge bound must not eagerly allocate a k-element array per group.
  */
final class TopKHeapBuffer(
    keyProj: UnsafeProjection,
    ord: Ordering[InternalRow],
    k: Int,
    partial: Boolean,
    outProj: UnsafeProjection) {

  private val heaps =
    new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()

  def insert(row: InternalRow): Unit = {
    val key = keyProj(row)
    var heap = heaps.get(key)
    if (heap == null) {
      heap = new java.util.PriorityQueue[InternalRow](
        math.min(k, 16) + 1, ord.reverse)
      heaps.put(key.copy(), heap)
    }
    if (heap.size() < k) heap.add(row.copy())
    else if (ord.compare(row, heap.peek()) < 0) {
      heap.poll(); heap.add(row.copy())
    }
  }

  /** Drains every heap in rank order; the final phase attaches rn. Emitted
    * rows go through outProj (downstream operators require UnsafeRow). */
  def result(): Iterator[InternalRow] = {
    val it = heaps.values().iterator()
    new Iterator[InternalRow] {
      private var current: Iterator[InternalRow] = Iterator.empty
      override def hasNext: Boolean = {
        while (!current.hasNext && it.hasNext) {
          val heap = it.next()
          val rows = new Array[InternalRow](heap.size())
          var i = rows.length - 1
          while (i >= 0) { rows(i) = heap.poll(); i -= 1 } // drain → sorted
          current =
            if (partial) rows.iterator.map(outProj)
            else rows.iterator.zipWithIndex.map { case (r, idx) =>
              outProj(new JoinedRow(r,
                new GenericInternalRow(Array[Any](idx + 1))))
            }
        }
        current.hasNext
      }
      override def next(): InternalRow = { hasNext; current.next() }
    }
  }
}

/** Physical bounded-heap top-k. `partial = true` emits the per-partition
  * survivors without rank; the final node (after the exchange
  * EnsureRequirements inserts for its ClusteredDistribution) merges heaps
  * and attaches rn.
  *
  * Participates in whole-stage codegen as a BLOCKING operator (the
  * SortExec pattern): the child's generated pipeline feeds insert() row by
  * row with no iterator boundary, and once input is exhausted the drained
  * heaps stream into the parent's generated consume — so the partial phase
  * fuses with the scan/filter/project below it and the final phase fuses
  * with whatever sits above, instead of breaking both pipelines apart.
  */
case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    sortOrders: Seq[SortOrder],
    k: Int,
    rnAttr: Attribute,
    partial: Boolean,
    child: SparkPlan)
  extends UnaryExecNode
  with org.apache.spark.sql.execution.BlockingOperatorWithCodegen {

  override def output: Seq[Attribute] =
    if (partial) child.output else child.output :+ rnAttr

  override def producedAttributes: AttributeSet = AttributeSet(rnAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else if (groupExprs.isEmpty) Seq(AllTuples)
    else Seq(ClusteredDistribution(groupExprs))

  /** Fresh per-task state; called from doExecute AND from generated code
    * (the plan node rides the codegen references array, like SortExec's
    * createSorter). */
  def createBuffer(): TopKHeapBuffer = new TopKHeapBuffer(
    UnsafeProjection.create(groupExprs, child.output),
    new LazilyGeneratedOrdering(sortOrders, child.output),
    k, partial,
    UnsafeProjection.create(output, output))

  override protected def doExecute(): RDD[InternalRow] = {
    val groups = groupExprs
    val orders = sortOrders
    val kk = k
    val isPartial = partial
    val childOutput = child.output
    val outAttrs = output
    child.execute().mapPartitions { iter =>
      val buf = new TopKHeapBuffer(
        UnsafeProjection.create(groups, childOutput),
        new LazilyGeneratedOrdering(orders, childOutput),
        kk, isPartial,
        UnsafeProjection.create(outAttrs, outAttrs))
      while (iter.hasNext) buf.insert(iter.next())
      buf.result()
    }
  }

  // ---- whole-stage codegen (blocking-operator shape, cf. SortExec) ----

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    child.asInstanceOf[CodegenSupport].inputRDDs()

  private var bufferVar: String = _

  override protected def doProduce(ctx: CodegenContext): String = {
    val needInput = ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN,
      "topkNeedInput", v => s"$v = true;")
    val thisPlan = ctx.addReferenceObj("topkPlan", this)
    bufferVar = ctx.addMutableState(classOf[TopKHeapBuffer].getName,
      "topkBuffer", v => s"$v = $thisPlan.createBuffer();",
      forceInline = true)
    val outputIter = ctx.addMutableState(
      "scala.collection.Iterator<InternalRow>", "topkOutput",
      forceInline = true)
    val addToBuffer = ctx.freshName("addToTopKBuffer")
    val addFunc = ctx.addNewFunction(addToBuffer,
      s"""
         |private void $addToBuffer() throws java.io.IOException {
         |  ${child.asInstanceOf[CodegenSupport].produce(ctx, this)}
         |}
       """.stripMargin.trim)
    val row = ctx.freshName("topkRow")
    s"""
       |if ($needInput) {
       |  $addFunc();
       |  $outputIter = $bufferVar.result();
       |  $needInput = false;
       |}
       |while ($limitNotReachedCond $outputIter.hasNext()) {
       |  UnsafeRow $row = (UnsafeRow) $outputIter.next();
       |  ${consume(ctx, null, row)}
       |  if (shouldStop()) return;
       |}
     """.stripMargin
  }

  override def doConsume(
      ctx: CodegenContext, input: Seq[ExprCode], row: ExprCode): String =
    s"""
       |${row.code}
       |$bufferVar.insert((InternalRow) ${row.value});
     """.stripMargin

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

/** Rewrites Filter(rn ≤ k, Window(row_number() AS rn)) → Filter(rn ≤ k,
  * GroupedTopK(...)). The filter stays as a safety re-check (see class
  * doc of [[GroupedTopK]]). */
object RewriteTopKWindow extends Rule[LogicalPlan] {

  private def limitOf(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k)
    // guard the decrement: rn < Int.MinValue would wrap to Int.MaxValue
    // and turn an always-false filter into a rewrite that fires
    case LessThan(a: Attribute, IntegerLiteral(k))
        if a.semanticEquals(rn) && k > Int.MinValue => Some(k - 1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        Window(Seq(a @ Alias(
          WindowExpression(_: RowNumber,
            WindowSpecDefinition(part, order, _)), _)), _, _, child, _)) =>
      limitOf(cond, a.toAttribute) match {
        case Some(k) if k > 0 =>
          // if Spark's InferWindowGroupLimit already wrapped the child in
          // its sort-based pre-bound, strip it: the heap phases subsume it
          // (same bound, no sort) and stacking both doubles the work.
          // Strip ONLY a pre-bound that provably belongs to THIS window —
          // same partition keys, same order, a row_number rank, limit ≥ k
          // — so a differently-specced WindowGroupLimit placed by any
          // other rule (or a future Spark) is left intact rather than
          // silently dropped (its rows would be wrong to un-bound).
          val base = child match {
            case wgl: WindowGroupLimit if wgl.limit >= k &&
                wgl.rankLikeFunction.isInstanceOf[RowNumber] &&
                wgl.partitionSpec.length == part.length &&
                wgl.partitionSpec.zip(part).forall { case (x, y) => x.semanticEquals(y) } &&
                wgl.orderSpec.length == order.length &&
                wgl.orderSpec.zip(order).forall { case (x, y) => x.semanticEquals(y) } =>
              wgl.child
            case c => c
          }
          f.copy(child = GroupedTopK(part, order, k, a.toAttribute, base))
        case _ => f
      }
  }
}

/** Plans the logical node as partial → (exchange) → final. */
object TopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupedTopK(g, o, k, rn, child) =>
      val partialExec = TopKPerGroupExec(g, o, k, rn, partial = true,
        planLater(child))
      TopKPerGroupExec(g, o, k, rn, partial = false, partialExec) :: Nil
    case _ => Nil
  }
}

object TopKPerGroup {
  /** Session-local install (the extensions path is
    * `spark.sql.extensions=graft.functions.GraftExtensions`). */
  def install(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(RewriteTopKWindow))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteTopKWindow
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
  }

  def uninstall(spark: SparkSession): Unit = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == RewriteTopKWindow)
    spark.experimental.extraStrategies =
      spark.experimental.extraStrategies.filterNot(_ == TopKStrategy)
  }
}

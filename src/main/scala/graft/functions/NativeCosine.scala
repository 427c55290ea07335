package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen cosine similarity over ArrayType(FloatType) or
  * ArrayType(DoubleType) — the §4.3 "custom Catalyst Expression" tier:
  * unlike a Scala UDF (boxing + serialization per row) or the HOF
  * formulation (interpreted lambda per element), this compiles to a tight
  * primitive Java loop inside whole-stage codegen — the formulation for
  * the 100 TB hot path.
  *
  * Semantics (single pass, per-accumulator order identical to the HOF /
  * DuckDB mirror, so results are bit-identical):
  *   dot/(sqrt(Σx²)·sqrt(Σy²)); NULL when lengths differ, arrays are
  *   empty, or either norm is zero. Array elements are assumed non-null
  *   (embedding columns; null elements read as 0.0). Each side reads in
  *   its own element precision — a double-typed corpus is never narrowed
  *   to float; accumulation is double either way.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isDoubleArr(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<FLOAT> or ARRAY<DOUBLE> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n == 0 || n != y.numElements()) return null
    val xd = isDoubleArr(left.dataType)
    val yd = isDoubleArr(right.dataType)
    var dot = 0d; var na = 0d; var nb = 0d; var i = 0
    while (i < n) {
      val xi = if (xd) x.getDouble(i) else x.getFloat(i).toDouble
      val yi = if (yd) y.getDouble(i) else y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    if (na == 0d || nb == 0d) null
    else java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      def getter(arr: String, dt: DataType): String =
        if (isDoubleArr(dt)) s"$arr.getDouble($i)"
        else s"(double) $arr.getFloat($i)"
      s"""
         |final int $n = $a.numElements();
         |if ($n == 0 || $n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $x = ${getter(a, left.dataType)};
         |    final double $y = ${getter(b, right.dataType)};
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  if ($na == 0.0 || $nb == 0.0) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_sim_native"
}

object NativeCosine {

  val name = "cosine_sim_native"

  private val info = new ExpressionInfo(classOf[CosineSim].getName, name)

  private val builder: FunctionBuilder = { args =>
    require(args.length == 2, s"$name takes exactly 2 arguments")
    CosineSim(args.head, args(1))
  }

  /** Descriptor for SparkSessionExtensions.injectFunction. */
  val descriptor: (FunctionIdentifier, ExpressionInfo, FunctionBuilder) =
    (FunctionIdentifier(name), info, builder)

  /** Idempotent in-session registration (library path, no extensions). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(name), info, builder)

  /** Idempotently attach [[PromoteCosineUdf]] to an existing session. */
  def enableUdfPromotion(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(PromoteCosineUdf))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PromoteCosineUdf
}

/** Optimizer rule (§4.3 custom-Catalyst tier): rewrites calls to the
  * registered `cosine_sim` Scala UDF into the native [[CosineSim]]
  * expression — users writing the convenient SQL UDF get the codegen'd
  * loop automatically. Null semantics of the UDF and the expression are
  * identical by construction, so the rewrite is observation-equivalent. */
object PromoteCosineUdf
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.ScalaUDF
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case u: ScalaUDF
          if u.udfName.contains("cosine_sim") && u.children.length == 2 &&
            u.children.forall(_.dataType match {
              case ArrayType(FloatType, _) => true
              case _ => false
            }) =>
        CosineSim(u.children.head, u.children(1))
    }
}

/** Cluster entry point: `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  * injects the engine's native expressions and rewrites at session build
  * time. For an already-built session, [[NativeCosine.register]] +
  * [[NativeCosine.enableUdfPromotion]] do the same. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(NativeCosine.descriptor)
    ext.injectFunction(NativeSimHash.descriptor)
    ext.injectFunction(NativeJaccard.descriptor)
    ext.injectFunction(NativeFingerprint.descriptor)
    ext.injectFunction(NativeJaro.descriptor)
    ext.injectFunction(NativeDot.descriptor)
    ext.injectOptimizerRule(_ => PromoteCosineUdf)
    ext.injectOptimizerRule(_ => graft.plans.RollupRewrite)
    ext.injectOptimizerRule(_ => graft.plans.JoinElimination)
    ext.injectOptimizerRule(_ => graft.plans.RewriteTopKWindow)
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
  }
}

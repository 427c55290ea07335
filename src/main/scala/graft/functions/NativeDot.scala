package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen EXACT integer dot product over two ArrayType(LongType)
  * columns — the verify kernel for scaled-integer vector audits
  * (q_lsh_eval's all-pairs cosine ground truth). The HOF formulation
  * (`aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)`)
  * runs two interpreted lambdas per element and allocates the zipped
  * array per pair — measured ~6 s for 600k 64-dim pairs; this compiles to
  * a primitive multiply-add loop inside whole-stage codegen.
  *
  * Semantics (identical to the HOF twin and the DuckDB mirror):
  * Σ aᵢ·bᵢ as BIGINT; NULL when lengths differ, and NULL when EITHER
  * array carries a NULL element — identical in the interpreted and the
  * codegen path, so a globally registered SQL function cannot crash or
  * silently diverge depending on which engine path runs (the
  * interpreted path used to unbox a GenericArrayData null into an NPE
  * while codegen read a 0 from an UnsafeArrayData null slot). The
  * per-element guard is emitted ONLY when the static array type admits
  * null elements (containsNull) — a containsNull=false input keeps the
  * original unguarded multiply-add loop, measured ~20% faster on
  * q_lsh_eval's 600k×64 hot loop, which is why that query builds its
  * vectors non-null-typed (ifnull inside the transform lambda). An
  * input that VIOLATES containsNull=false is outside the type contract
  * (undefined across all of Spark, not just here).
  * Overflow is the caller's bound to prove (scaled ±2^m entries give
  * |dot| ≤ n·2^2m — q_lsh_eval's ±11k over 64 dims is < 2^33).
  */
case class DotLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<BIGINT> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0L; var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      dot += x.getLong(i) * y.getLong(i); i += 1
    }
    java.lang.Long.valueOf(dot)
  }

  /** True when either input's STATIC type admits null elements — the
    * per-element guard is emitted only then (see the class doc). */
  private def anyContainsNull: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  })

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val body =
        if (anyContainsNull)
          s"""|  for (int $i = 0; $i < $n; $i++) {
              |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
              |      ${ev.isNull} = true;
              |      break;
              |    }
              |    $dot += $a.getLong($i) * $b.getLong($i);
              |  }""".stripMargin
        else
          s"""|  for (int $i = 0; $i < $n; $i++) {
              |    $dot += $a.getLong($i) * $b.getLong($i);
              |  }""".stripMargin
      s"""
         |final int $n = $a.numElements();
         |long $dot = 0L;
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |$body
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotLong =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_long_native"
}

object NativeDot {

  val name = "dot_long_native"

  private val info = new ExpressionInfo(classOf[DotLong].getName, name)

  private val builder: FunctionBuilder = { args =>
    require(args.length == 2, s"$name takes exactly 2 arguments")
    DotLong(args.head, args(1))
  }

  /** Descriptor for SparkSessionExtensions.injectFunction. */
  val descriptor: (FunctionIdentifier, ExpressionInfo, FunctionBuilder) =
    (FunctionIdentifier(name), info, builder)

  /** Idempotent in-session registration (library path, no extensions). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(name), info, builder)
}

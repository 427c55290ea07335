package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Heuristic language identification (SURVEY.md north-star "text analysis":
  * language-ID by n-gram/marker heuristic — no ML model, deterministic).
  *
  * Scores a text against per-language marker-token profiles (high-frequency
  * function words — the 1-gram version of the classic char-n-gram profile
  * method) and returns the argmax language, or "und" when nothing matches.
  *
  * Pure codegen'd expressions: one pass over the token array per language
  * profile (profiles are literal arrays in the plan, broadcast for free).
  * Deterministic tie-break: higher score wins, then lexicographically
  * smaller language code (via struct max ordering).
  */
object LangId extends Serializable {

  val profiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "is", "in", "to", "it", "that"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "en", "un"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une", "est"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "nicht", "mit"))

  /** Occurrence count of profile tokens in the token array. */
  private def score(tokens: Column, markers: Seq[String]): Column =
    size(filter(tokens, t => array_contains(typedlit(markers), t)))

  private val langs: Array[String] = profiles.keys.toArray.sorted
  /** marker token → langs containing it (markers overlap: "la" is both
    * es and fr), resolved once. */
  private val markerLangs: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    for ((lang, ms) <- profiles; w <- ms)
      m.merge(w, Array(langs.indexOf(lang)),
        (a, b) => a ++ b)
    m
  }
  private val undResult = UTF8String.fromString("und")
  private val langResults = langs.map(UTF8String.fromString)

  /** One compiled pass: tokenize, score every profile, argmax. Exactly
    * [[detectHof]]'s semantics (the spec pins equality): ties break to
    * the alphabetically smaller code, score ≤ 0 and NULL text give
    * "und". Exists because the HOF form runs one interpreted
    * filter-lambda per profile per row — 4 × |tokens| × 8 interpreted
    * marker compares, measured as the dominant cost of q_lang_id. */
  def detectOne(t: UTF8String): UTF8String = {
    if (t == null) return undResult
    val tokens = t.toLowerCase.toString.split("\\s+", -1)
    val counts = new Array[Int](langs.length)
    var i = 0
    while (i < tokens.length) {
      val ls = markerLangs.get(tokens(i))
      if (ls != null) {
        var j = 0
        while (j < ls.length) { counts(ls(j)) += 1; j += 1 }
      }
      i += 1
    }
    var best = -1; var bestScore = 0
    var k = 0
    while (k < counts.length) {
      if (counts(k) > bestScore) { bestScore = counts(k); best = k }
      k += 1
    }
    if (best < 0) undResult else langResults(best)
  }

  /** Detected language code column — the native single-pass scorer. */
  def detect(text: Column): Column =
    org.apache.spark.sql.graftbridge.PlanBridge.column(LangDetectExpr(
      org.apache.spark.sql.graftbridge.PlanBridge.expression(text)))

  /** The original HOF formulation — kept as the independent mirror the
    * spec compares the native scorer against (the NativeDot/LshBucket
    * discipline). NOT a production path: interpreted per row. */
  def detectHof(text: Column): Column = {
    val tokens = split(lower(text), "\\s+")
    // struct max: (score, inverted-lang) so ties pick the alphabetically
    // first code deterministically.
    val scored = profiles.toSeq.sortBy(_._1).map { case (lang, markers) =>
      struct(score(tokens, markers).as("s"),
        lit(-profiles.keys.toSeq.sorted.indexOf(lang)).as("o"),
        lit(lang).as("lang"))
    }
    val best = greatest(scored: _*)
    // NULL text must yield "und" (matching the registered lang_id SQL UDF):
    // without the guard every score is NULL, the <=0 branch evaluates NULL,
    // and the result falls through to a NULL/arbitrary language.
    when(text.isNull || best.getField("s") <= 0, lit("und"))
      .otherwise(best.getField("lang"))
  }
}

/** Codegen wrapper for [[LangId.detectOne]]: the generated code is one
  * virtual call into the compiled scorer (all tokenization and marker
  * lookups run as JIT-compiled Scala), never an interpreted lambda.
  * NULL-tolerant by design: NULL text yields "und", so the expression
  * itself is never null. */
case class LangDetectExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"$prettyName requires STRING, got ${child.dataType.sql}")

  override def eval(input: InternalRow): Any =
    LangId.detectOne(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val impl = ctx.addReferenceObj("langId", LangId,
      "graft.functions.LangId$")
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        UTF8String ${ev.value} = $impl.detectOne(
          ${c.isNull} ? null : ${c.value});""",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

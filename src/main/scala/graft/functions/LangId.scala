package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

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
object LangId {

  val profiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "is", "in", "to", "it", "that"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "en", "un"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une", "est"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "nicht", "mit"))

  /** Occurrence count of profile tokens in the token array. */
  private def score(tokens: Column, markers: Seq[String]): Column =
    size(filter(tokens, t => array_contains(typedlit(markers), t)))

  /** Detected language code column ("en" | "es" | "fr" | "de" | "und"). */
  def detect(text: Column): Column = {
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

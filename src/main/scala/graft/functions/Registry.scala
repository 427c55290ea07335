package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL-surface function registry (SURVEY.md §2.3 K / §4.3): makes the
  * engine's scalar functions callable from `spark.sql(...)` strings.
  *
  * These are deliberately Scala UDFs, not Catalyst expressions: the
  * DataFrame API paths use the codegen'd HOF formulations (see
  * SimilarityQueries.cosine, LangId.detect); the registry exists so SQL
  * users get the same vocabulary. UDF boxing cost is acceptable on the
  * SQL convenience path — if profiling ever shows one on a 100 TB hot
  * path, promote it to a native Expression (SURVEY.md §4.3 note).
  */
object Registry {

  def registerAll(spark: SparkSession): Unit = {
    spark.udf.register("cosine_sim",
      (a: Seq[Float], b: Seq[Float]) => {
        if (a == null || b == null || a.isEmpty || a.length != b.length) null
        else {
          var dot = 0d; var na = 0d; var nb = 0d; var i = 0
          while (i < a.length) {
            dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
            nb += b(i).toDouble * b(i); i += 1
          }
          if (na == 0 || nb == 0) null
          else java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
        }
      })

    spark.udf.register("normalize_text",
      (s: String) =>
        if (s == null) null
        else s.toLowerCase.trim.replaceAll("\\s+", " "))

    spark.udf.register("token_count",
      (s: String) =>
        if (s == null) 0 else s.split("\\s+").count(_.nonEmpty))

    spark.udf.register("jaccard_tokens",
      (a: String, b: String) => {
        if (a == null || b == null) null
        else {
          val sa = a.split("\\s+").filter(_.nonEmpty).toSet
          val sb = b.split("\\s+").filter(_.nonEmpty).toSet
          val u = (sa ++ sb).size
          if (u == 0) null
          else java.lang.Double.valueOf(sa.intersect(sb).size.toDouble / u)
        }
      })

    spark.udf.register("lang_id",
      (s: String) =>
        if (s == null) "und"
        else {
          val toks = s.toLowerCase.split("\\s+")
          val scored = LangId.profiles.toSeq.sortBy(_._1).map { case (lang, m) =>
            (toks.count(m.contains), lang)
          }
          val (best, lang) = scored.maxBy { case (n, l) => (n, -l.head.toInt) }
          // ties resolve to the alphabetically first code (stable sort +
          // maxBy keeps the first of equal keys)
          if (best <= 0) "und"
          else scored.filter(_._1 == best).map(_._2).min
        })
  }
}

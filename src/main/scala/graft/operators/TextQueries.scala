package graft.operators

import graft.QueryModule
import org.apache.spark.sql.functions._

/** Text-processing queries over the `documents` table.
  *
  * Flagship: q_wordcount — the batch twin of the reference's implied
  * word-count topology (reference topics `input-words` →
  * `word-count-output`; see /root/reference/go/producer/producer.go:16 and
  * /root/reference/go/consumer/consumer.go:13). Tokenize → group → count,
  * exactly the job the reference's producer/consumer pair was built around.
  *
  * Scale notes (100 TB posture): explode(split(..)) is a generator inside
  * whole-stage codegen — no shuffle until the groupBy, which does a partial
  * (map-side) aggregation before the exchange. Word cardinality is bounded
  * by vocabulary size, so the post-shuffle state is tiny regardless of input
  * size; the sort is over the aggregated (small) result.
  */
object TextQueries extends QueryModule {

  override def queries: Map[String, Q] = Map(
    "q_wordcount" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) > 0)
        .groupBy("word")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("word").asc)),

    // Exact frequent words (count strictly above 1/500 of all tokens) via
    // the two-pass Misra–Gries plan: pass 1 is ONE scan producing (n, a
    // ≤500-counter summary) whose shuffle is 500 pairs per partition
    // regardless of vocabulary size; pass 2 exact-counts only the
    // candidates (broadcast InSet filter). At open-ended key cardinality
    // this replaces a full groupBy-all-keys shuffle with a
    // candidate-bounded one — see functions/HeavyHitters.scala for the
    // superset guarantee that makes the result EXACT, and the integer
    // `cnt * 500 > n` threshold both engines evaluate identically.
    "q_heavy_hitters" -> ((s, dir) => {
      val tok = t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) > 0)
      graft.functions.HeavyHitters.exactHeavyHitters(tok, "word", 500)
        .orderBy(col("cnt").desc, col("word").asc)
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "q_wordcount" ->
      """SELECT word, COUNT(*) AS cnt
        |FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS word FROM documents)
        |WHERE LENGTH(word) > 0
        |GROUP BY word
        |ORDER BY cnt DESC, word ASC""".stripMargin,

    "q_heavy_hitters" ->
      """WITH tok AS (
        |  SELECT word
        |  FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS word FROM documents)
        |  WHERE LENGTH(word) > 0),
        |tot AS (SELECT COUNT(word) AS n FROM tok)
        |SELECT word, COUNT(*) AS cnt
        |FROM tok, tot
        |GROUP BY word, n
        |HAVING COUNT(*) * 500 > n
        |ORDER BY cnt DESC, word ASC""".stripMargin
  )
}

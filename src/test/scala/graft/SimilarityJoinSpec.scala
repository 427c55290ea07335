package graft

import graft.functions.SimilarityJoin
import org.apache.spark.sql.functions._

/** The prefix-filtered exact set-similarity join: result equality against
  * the brute-force all-pairs twin (the completeness proof, exercised),
  * boundary inclusiveness, and the candidate-pruning contract on a
  * Zipfian corpus — the distribution real text has and the dense
  * synthetic fixtures do not. */
class SimilarityJoinSpec extends SparkSpec {

  import scala.jdk.CollectionConverters._

  private def df(rows: Seq[(Long, Seq[String])]) =
    spark.createDataFrame(
      rows.map { case (id, ts) =>
        org.apache.spark.sql.Row(id, ts)
      }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("toks",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType)))))

  /** Deterministic Zipfian corpus: 240 docs of 24 draws from a 400-token
    * vocabulary with p(k) ∝ 1/k, plus 8 planted near-duplicate pairs
    * (one-token mutations — jaccard ≈ 0.85). */
  private lazy val zipf: org.apache.spark.sql.DataFrame = {
    val rnd = new scala.util.Random(20260816)
    val vocab = (1 to 400).map(i => s"w$i")
    val weights = vocab.indices.map(i => 1.0 / (i + 1))
    val cum = weights.scanLeft(0.0)(_ + _).tail
    val total = cum.last
    def draw(): String = {
      val x = rnd.nextDouble() * total
      vocab(cum.indexWhere(_ >= x))
    }
    val base = (0 until 240).map { i =>
      (i.toLong, Seq.fill(24)(draw()).distinct)
    }
    val planted = (0 until 8).map { i =>
      val src = base(i * 7)._2
      (1000L + i, src.updated(src.size / 2, s"mut$i"))
    }
    df(base ++ planted)
  }

  test("prefix-filtered join equals brute force on the Zipfian corpus") {
    for (t <- Seq(0.5, 0.7, 0.85)) {
      val fast = SimilarityJoin.jaccardSelfJoin(zipf, "id", "toks", t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sorted.toSeq
      val brute = SimilarityJoin.bruteForceSelfJoin(zipf, "id", "toks", t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sorted.toSeq
      assert(fast == brute, s"mismatch at t=$t")
      if (t <= 0.85)
        assert(fast.size >= 8, s"planted near-dups missing at t=$t")
    }
  }

  test("prefix filter prunes: candidates well below the full posting join") {
    val cand = SimilarityJoin.candidateCount(zipf, "id", "toks", 0.7)
    // pairs sharing ANY token — what a filterless posting join verifies
    val tok = zipf.select(col("id"),
      explode(array_distinct(col("toks"))).as("w"))
    val all = tok.as("a").join(tok.as("b"),
        col("a.w") === col("b.w") && col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id")).distinct().count()
    info(s"candidates $cand of $all sharing pairs (ratio ${cand.toDouble / all})")
    // AllPairs prefix filtering alone held ≤ 1/4 on this corpus; the
    // PPJoin positional filter (overlap upper bound from the shared
    // token's ranks) measures 940/30621 ≈ 1/32 — pin ≤ 1/24 with margin
    assert(cand * 24 <= all,
      s"prefix+positional filter admitted $cand of $all sharing pairs — not pruning")
    val truePairs = SimilarityJoin
      .bruteForceSelfJoin(zipf, "id", "toks", 0.7).count()
    assert(cand >= truePairs, "candidates must cover every true pair")
  }

  test("boundary inclusiveness: a pair AT the threshold is kept") {
    // {a,b,c} vs {b,c,d}: |∩| = 2, |∪| = 4 — jaccard exactly 0.5
    val d = df(Seq(
      (1L, Seq("a", "b", "c")),
      (2L, Seq("b", "c", "d")),
      (3L, Seq("x", "y", "z"))))
    val got = SimilarityJoin.jaccardSelfJoin(d, "id", "toks", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 2L)))
    // exact integer α survives the rational boundary: t·n an exact
    // integer must not lose a prefix slot to double rounding
    val e = df(Seq(
      (1L, (1 to 10).map(i => s"t$i")),
      (2L, (1 to 10).map(i => s"t$i"))))
    val twins = SimilarityJoin.jaccardSelfJoin(e, "id", "toks", 1.0)
      .collect()
    assert(twins.length == 1 && twins.head.getDouble(2) == 1.0)
  }

  test("fixture smoke: equals brute force on sf0.001 document bigrams") {
    val grams = table("documents")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), expr(
        """transform(sequence(1, size(t) - 1),
          |  i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"""
          .stripMargin).as("grams"))
    val fast = SimilarityJoin.jaccardSelfJoin(grams, "doc_id", "grams", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sorted.toSeq
    val brute = SimilarityJoin.bruteForceSelfJoin(grams, "doc_id", "grams", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sorted.toSeq
    assert(fast == brute)
  }
}

package graft

import java.nio.file.Files

/** Planted-fixture semantics for EvalQueries: NDCG's 1.0 / 0.0 corners
  * and the ideal-DCG truncation, and the centroid classifier's perfect
  * diagonal on separable clusters.
  */
class EvalSpec extends SparkSpec {

  private def run(name: String, dir: String) =
    SparkEntry.queries(name)(spark, dir)

  /** 64-dim one-hot-ish vector: `hot` carries `w`, rest zero. */
  private def vec(hot: Int, w: Float): Array[Float] = {
    val a = Array.fill(64)(0.0f); a(hot) = w; a
  }

  private def emb(d: String,
                  rows: Seq[(Long, Array[Float], Int)]): String = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$d/embeddings.parquet")
    d
  }

  test("ndcg: perfect ranking scores 1.0, fully-wrong ranking scores 0.0") {
    // probe 0 (label 0, axis 0). Same-label candidates sit ON the probe
    // axis (cos 1 > everything); 12 other-label candidates on axis 1.
    val d = emb(Files.createTempDirectory("graft-ndcg").toString,
      Seq((0L, vec(0, 1f), 0)) ++
        (1L to 3L).map(i => (i, vec(0, (10 - i).toFloat), 0)) ++
        (4L to 15L).map(i => (i, vec(1, i.toFloat), 1)))
    val rows = run("q_ndcg", d).collect()
      .map(r => r.getAs[Long]("probe_id") ->
        ((r.getAs[Long]("n_rel"), r.getAs[Double]("ndcg"),
          r.getAs[Double]("p_at_10")))).toMap
    // probe 0: its 3 same-label twins rank 1-3 (cos 1), m = 3 → ideal
    assert(rows(0L) == ((3L, 1.0, 0.3)), rows(0L).toString)
    // probe 4 (label 1): the top-10 contains 9 same-label + the probe
    // axis-0 vectors score cos 0 — same-label fills the list → NDCG 1
    assert(rows(4L)._2 == 1.0)
    // a probe whose ONLY same-label candidates are crowded out: give
    // label 2 a lone probe (no same-label candidates at all) → idcg = 0
    val d2 = emb(Files.createTempDirectory("graft-ndcg2").toString,
      Seq((0L, vec(0, 1f), 2)) ++
        (4L to 15L).map(i => (i, vec(1, i.toFloat), 1)))
    val lone = run("q_ndcg", d2).collect()
      .find(_.getAs[Long]("probe_id") == 0L).get
    assert(lone.getAs[Long]("n_rel") == 0L)
    assert(lone.isNullAt(lone.fieldIndex("ndcg")),
      "no possible relevant candidate → NULL ndcg, not 0/0")
  }

  test("range-rank: distributed two-phase rank == single-window row_number") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // duplicate keys force the tiebreak; enough rows to span partitions
    val df = Seq.fill(5000)((rnd.nextInt(300).toLong, rnd.nextLong()))
      .zipWithIndex.map { case ((k, v), i) => (k, v, i.toLong) }
      .toDF("k", "v", "id")
    val two = graft.functions.RangeRank
      .withRank(df, Seq(col("k"), col("id")), "r", partitions = 7)
      .select("id", "r").as[(Long, Long)].collect().toMap
    val one = df.withColumn("r",
        row_number().over(Window.orderBy(col("k"), col("id"))))
      .select("id", "r").as[(Long, Long)].collect().toMap
    assert(two == one, "two-phase ranks must equal the global window")
    // and the two-phase plan has NO unpartitioned corpus window
    val risks = graft.plans.PlanDoctor.diagnose(
      graft.functions.RangeRank.withRank(df, Seq(col("k"), col("id")), "r",
        partitions = 7))
      .filter(f => f.severity == "risk" && f.rule == "global-window")
    assert(risks.isEmpty, risks.map(_.render).toString)
  }

  test("auc: separable scores give 1.0, inverted scores give 0.0") {
    // probe 0 label 0 on axis 0. Same-label candidates CLOSER to the
    // probe than every other-label candidate → AUC 1; flip labels → 0.
    def fixture(sameLabelNear: Boolean): String = {
      val (nearL, farL) = if (sameLabelNear) (0, 1) else (1, 0)
      emb(Files.createTempDirectory("graft-auc").toString,
        Seq((0L, vec(0, 1f), 0)) ++
          (1L to 5L).map(i => (i, { // near: mostly axis 0
            val a = vec(0, 10f); a(1) = i.toFloat; a
          }, nearL)) ++
          (6L to 10L).map(i => (i, { // far: mostly axis 1
            val a = vec(1, 10f); a(0) = (i - 5).toFloat; a
          }, farL)))
    }
    val hi = run("q_auc", fixture(true)).collect().head
    assert(hi.getAs[Long]("n_pos") == 5L && hi.getAs[Long]("n_neg") == 5L)
    assert(hi.getAs[Double]("auc") == 1.0)
    val lo = run("q_auc", fixture(false)).collect().head
    assert(lo.getAs[Double]("auc") == 0.0)
  }

  test("reliability: deciles partition the ranking; separable data is " +
    "a step function") {
    val d = emb(Files.createTempDirectory("graft-rel").toString,
      Seq((0L, vec(0, 1f), 0)) ++
        (1L to 10L).map(i => (i, { // same label, cosine ≈ 1
          val a = vec(0, 10f); a(1) = i * 0.1f; a
        }, 0)) ++
        (11L to 20L).map(i => (i, { // other label, cosine ≈ 0
          val a = vec(1, 10f); a(0) = (i - 10) * 0.1f; a
        }, 1)))
    val rows = run("q_reliability", d).collect()
      .map(r => (r.getAs[Long]("decile"), r.getAs[Long]("n_bucket"),
        r.getAs[Long]("n_pos"), r.getAs[Double]("pos_rate")))
    assert(rows.map(_._2).sum == 20L, "deciles partition all candidates")
    assert(rows.map(_._1).toSeq == rows.map(_._1).toSeq.sorted)
    // rank ascending = score ascending: the LOW deciles are negatives,
    // the HIGH deciles positives — a clean step
    val (lo, hi) = rows.partition(_._1 < 5)
    assert(lo.forall(_._4 == 0.0), s"low deciles all-negative: $rows")
    assert(hi.forall(_._4 == 1.0), s"high deciles all-positive: $rows")
  }

  test("minhash_eval: planted dup is found, disjoint docs are neither " +
    "true nor candidate") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-me").toString
    // docs 1,2 identical (jaccard 1 — true pair AND band collision);
    // docs 3,4 disjoint from everything
    Seq((1L, "x y z w q r", "en", "s", 10L),
      (2L, "x y z w q r", "en", "s", 10L),
      (3L, "a b c d e f", "en", "s", 10L),
      (4L, "g h i j k l", "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val r = run("q_minhash_eval", d).collect().head
    assert(r.getAs[Long]("n_true") == 1L)
    assert(r.getAs[Long]("n_hit") == 1L,
      "identical docs share every band — the candidate pass MUST find them")
    assert(r.getAs[Double]("recall") == 1.0)
    assert(r.getAs[Long]("n_cand") >= 1L)
  }

  test("q_lsh_eval precondition: the fixture's embeddings are fixed-width") {
    // the array-grain truth rewrite in q_lsh_eval assumes every vector
    // has the identical dense position set 0..d-1 (see the comment at
    // the vecs block): posexplode emits all positions, so the invariant
    // reduces to ONE distinct embedding length across the fixture. A
    // ragged fixture would silently drop pairs (NativeDot NULL on length
    // mismatch) or misalign dots — pin it here, where a fixture change
    // fails loudly instead.
    import org.apache.spark.sql.functions._
    val widths = table("embeddings")
      .select(size(col("embedding")).as("d")).distinct().collect()
    assert(widths.length == 1,
      s"embeddings fixture is ragged: ${widths.mkString(",")}")
  }

  test("centroid confusion: separable clusters give a perfect diagonal") {
    val d = emb(Files.createTempDirectory("graft-conf").toString,
      (0L to 4L).map(i => (i, vec(0, (i + 1).toFloat), 0)) ++
        (5L to 9L).map(i => (i, vec(1, (i + 1).toFloat), 1)) ++
        (10L to 14L).map(i => (i, vec(2, (i + 1).toFloat), 7)))
    val m = run("q_centroid_confusion", d).collect()
      .map(r => (r.getAs[Int]("true_label"), r.getAs[Int]("pred_label")) ->
        r.getAs[Long]("n")).toMap
    assert(m == Map((0, 0) -> 5L, (1, 1) -> 5L, (7, 7) -> 5L),
      s"axis-separated clusters must classify perfectly: $m")
  }
}

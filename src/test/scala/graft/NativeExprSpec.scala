package graft

import graft.functions.{GraftExtensions, NativeCosine}
import org.apache.spark.sql.functions._

/** The native codegen CosineSim expression: correctness vs the HOF
  * formulation, null semantics, plan shape, and registration paths. */
class NativeExprSpec extends SparkSpec {

  private val hofCosine =
    """aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)
      | / (sqrt(aggregate(a, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
      |  * sqrt(aggregate(b, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))""".stripMargin

  test("native cosine is bit-identical to the HOF formulation on embeddings") {
    NativeCosine.register(spark)
    val e = table("embeddings")
    val pairs = e.select(col("vec_id"), col("embedding").as("a"))
      .crossJoin(broadcast(
        e.filter(col("vec_id") < 3).select(col("embedding").as("b"))))
    val rows = pairs.select(
      call_function(NativeCosine.name, col("a"), col("b")).as("native"),
      expr(hofCosine).as("hof")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1),
        s"native=${r.getDouble(0)} hof=${r.getDouble(1)}")
    }
  }

  test("null semantics: length mismatch, empty arrays, zero norm, null input") {
    NativeCosine.register(spark)
    val r = spark.sql(s"""SELECT
      ${NativeCosine.name}(array(CAST(1.0 AS FLOAT)), array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS len_mismatch,
      ${NativeCosine.name}(CAST(array() AS ARRAY<FLOAT>), CAST(array() AS ARRAY<FLOAT>)) AS empty,
      ${NativeCosine.name}(array(CAST(0.0 AS FLOAT)), array(CAST(1.0 AS FLOAT))) AS zero_norm,
      ${NativeCosine.name}(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT))) AS null_in""").head()
    (0 until 4).foreach(i => assert(r.isNullAt(i), s"field $i should be null"))
  }

  test("interpreted eval path agrees with codegen (filter forces eval)") {
    NativeCosine.register(spark)
    // constant-folding runs the interpreted eval; compare to a literal
    val folded = spark.sql(s"""SELECT ${NativeCosine.name}(
        array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        array(CAST(2.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS c""").head().getDouble(0)
    assert(math.abs(folded - 1.0) < 1e-12)
  }

  test("q_cosine_topk plan contains the native expression, no UDF invoke") {
    val plan = q("q_cosine_topk").queryExecution.executedPlan.toString
    assert(plan.contains("cosine_sim_native"), s"native expr missing:\n$plan")
    assert(!plan.contains("ScalaUDF"), "hot path fell back to a Scala UDF")
  }

  test("PromoteCosineUdf rewrites the registered UDF to the native expression") {
    graft.functions.Registry.registerAll(spark)
    NativeCosine.enableUdfPromotion(spark)
    table("embeddings").limit(20).createOrReplaceTempView("emb_native")
    val df = spark.sql("""
      SELECT vec_id, cosine_sim(embedding, embedding) AS c
      FROM emb_native""")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("cosine_sim_native"),
      s"UDF not promoted to native expression:\n$plan")
    assert(!plan.contains("ScalaUDF"), "ScalaUDF survived the rewrite")
    df.collect().foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-9))
  }

  test("native token_set_jaccard matches array_intersect formulation") {
    graft.functions.NativeJaccard.register(spark)
    val df = table("documents").limit(60)
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("t"))
    val a = df.alias("a"); val b = df.alias("b")
    val inter = size(array_intersect(col("a.t"), col("b.t")))
    val rows = a.crossJoin(b)
      .select(
        call_function(graft.functions.NativeJaccard.name,
          col("a.t"), col("b.t")).as("native"),
        (inter.cast("double") /
          (size(col("a.t")) + size(col("b.t")) - inter)).as("ref"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1),
      s"native=${r.getDouble(0)} ref=${r.getDouble(1)}"))
  }

  test("token_set_jaccard null/edge semantics") {
    graft.functions.NativeJaccard.register(spark)
    val r = spark.sql(s"""SELECT
      token_set_jaccard(CAST(array() AS ARRAY<STRING>), CAST(array() AS ARRAY<STRING>)) AS both_empty,
      token_set_jaccard(array('a'), CAST(array() AS ARRAY<STRING>)) AS one_empty,
      token_set_jaccard(array('a','a','b'), array('a','b')) AS dup_input""").head()
    assert(r.isNullAt(0), "0/0 must be null")
    assert(r.getDouble(1) == 0.0)
    assert(r.getDouble(2) == 1.0, "duplicates must collapse to sets")
  }

  test("native rolling_fingerprint equals the HOF fold on all documents") {
    graft.functions.NativeFingerprint.register(spark)
    val hofFp =
      """aggregate(split(text, ' '), CAST(0 AS BIGINT),
        |  (acc, w) -> (acc * 131 + aggregate(split(w, ''), CAST(0 AS BIGINT),
        |    (a, c) -> (a * 31 + ascii(c)) % 1000000007)) % 1000000007)""".stripMargin
    val rows = table("documents").select(
      call_function(graft.functions.NativeFingerprint.name, col("text")).as("native"),
      expr(hofFp).as("hof")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1),
      s"native=${r.getLong(0)} hof=${r.getLong(1)}"))
  }

  test("rolling_fingerprint edge cases match split semantics") {
    graft.functions.NativeFingerprint.register(spark)
    val r = spark.sql("""SELECT
      rolling_fingerprint('') AS empty,
      rolling_fingerprint('a  b') AS double_space,
      rolling_fingerprint(' a') AS leading,
      rolling_fingerprint('ab') AS plain""").head()
    // '' → one empty token → 0
    assert(r.getLong(0) == 0L)
    // 'ab' → ((97*31+98) % P) folded once
    assert(r.getLong(3) == ((0L * 131) + (97L * 31 + 98)) % 1000000007L)
    // double space / leading space: hash empty tokens as 0 (just stable)
    assert(r.getLong(1) != r.getLong(3) && r.getLong(2) != r.getLong(3))
  }

  test("native dot_long equals the HOF fold, exact-integer, on scaled vectors") {
    graft.functions.NativeDot.register(spark)
    val e = table("embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, v -> CAST(FLOOR(CAST(v AS DOUBLE) * 10000 + 0.5) AS BIGINT))")
          .as("iv"))
    val pairs = e.select(col("vec_id"), col("iv").as("a"))
      .crossJoin(broadcast(e.filter(col("vec_id") < 3).select(col("iv").as("b"))))
    val rows = pairs.select(
      call_function(graft.functions.NativeDot.name, col("a"), col("b")).as("native"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)").as("hof"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1),
      s"native=${r.getLong(0)} hof=${r.getLong(1)}"))
  }

  test("dot_long null/edge semantics; interpreted path agrees with codegen") {
    graft.functions.NativeDot.register(spark)
    val n = graft.functions.NativeDot.name
    val r = spark.sql(s"""SELECT
      $n(array(1L), array(1L, 2L)) AS len_mismatch,
      $n(CAST(array() AS ARRAY<BIGINT>), CAST(array() AS ARRAY<BIGINT>)) AS empty,
      $n(CAST(NULL AS ARRAY<BIGINT>), array(1L)) AS null_in,
      $n(array(2L, -3L, 5L), array(7L, 11L, -13L)) AS v""").head()
    assert(r.isNullAt(0) && r.isNullAt(2), "mismatch/null must be NULL")
    assert(r.getLong(1) == 0L, "empty arrays dot to 0")
    assert(r.getLong(3) == 2L * 7 - 3 * 11 - 5 * 13)
    // interpreted eval (nullSafeEval) — exercised via the expression
    // directly, no codegen context
    val ex = graft.functions.DotLong(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(2L, -3L, 5L), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(7L, 11L, -13L), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)))
    assert(ex.eval(null) == (2L * 7 - 3 * 11 - 5 * 13))
  }

  test("dot_long NULL ELEMENT yields NULL on both eval paths") {
    // the two engine paths used to disagree: interpreted NPE'd unboxing a
    // GenericArrayData null while codegen read 0 from an UnsafeArrayData
    // null slot — both must return NULL for a null element on either side
    graft.functions.NativeDot.register(spark)
    val n = graft.functions.NativeDot.name
    // codegen path (SQL over a projected array with a null element)
    val r = spark.sql(
      s"""SELECT $n(array(1L, CAST(NULL AS BIGINT), 3L), array(1L, 2L, 3L)) AS a,
         |       $n(array(1L, 2L, 3L), array(1L, CAST(NULL AS BIGINT), 3L)) AS b
         |""".stripMargin).head()
    assert(r.isNullAt(0) && r.isNullAt(1),
      "codegen path must return NULL on a null element")
    // interpreted path (direct eval over GenericArrayData)
    val at = org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = true)
    val lit = org.apache.spark.sql.catalyst.expressions.Literal.create(
      Seq[java.lang.Long](1L, null, 3L), at)
    val full = org.apache.spark.sql.catalyst.expressions.Literal.create(
      Seq[java.lang.Long](1L, 2L, 3L), at)
    assert(graft.functions.DotLong(lit, full).eval(null) == null)
    assert(graft.functions.DotLong(full, lit).eval(null) == null)
  }

  test("GraftExtensions injects the function into a new session") {
    // Re-applying the extension to the current session's registry must be
    // idempotent; a cold cluster would pass the class via
    // spark.sql.extensions (documented on GraftExtensions).
    new GraftExtensions()
    NativeCosine.register(spark)
    NativeCosine.register(spark)
    assert(spark.sessionState.functionRegistry
      .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(NativeCosine.name)))
  }
}

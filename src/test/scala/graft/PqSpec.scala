package graft

import graft.functions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product quantization: kernel exactness (codes/LUT/ADC vs an
  * independent Scala reference on collected rows), null/dim guards, and
  * end-to-end recall of the ADC scan + exact re-rank against the
  * brute-force cosine top-k on the fixture embeddings. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = table("embeddings")
  // m=16/k=64 (4-dim subspaces): the fixture embeddings are near-isotropic
  // gaussians — PQ's hardest case (no cluster structure to exploit) — so
  // the spec uses a finer codebook than a clustered production corpus
  // would need. Still a 16× scan-byte cut vs 64 float32s.
  private lazy val model = ProductQuantizer.train(emb, "embedding", m = 16, k = 64)

  /** Scala reference: normalize, then per-subspace argmin code. */
  private def refCodes(v: Array[Double]): Array[Int] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    val x = if (n == 0d) v else v.map(_ / n)
    val sd = model.subDim
    Array.tabulate(model.m) { j =>
      (0 until model.k).minBy { c =>
        val cent = model.codebooks(j)(c)
        (0 until sd).map { t => val d = x(j * sd + t) - cent(t); d * d }.sum
      }
    }
  }

  test("PqEncode matches the Scala reference argmin on real vectors") {
    val got = emb.orderBy("vec_id").limit(20)
      .select(col("vec_id"), col("embedding"),
        ProductQuantizer.codes(col("embedding"), model).as("codes"))
      .collect()
    got.foreach { r =>
      val v = r.getSeq[Float](1).map(_.toDouble).toArray
      assert(r.getSeq[Int](2).toArray.sameElements(refCodes(v)),
        s"codes mismatch for vec ${r.getLong(0)}")
    }
  }

  test("PqAdc(codes, lut) equals the true subspace-centroid distance sum") {
    val rows = emb.orderBy("vec_id").limit(10)
      .select(
        ProductQuantizer.codes(col("embedding"), model).as("codes"),
        ProductQuantizer.lut(col("embedding"), model).as("lut"))
      .withColumn("adc", ProductQuantizer.adc(col("codes"), col("lut"), model))
      .collect()
    rows.foreach { r =>
      val codes = r.getSeq[Int](0)
      val lut = r.getSeq[Double](1)
      val expect = codes.zipWithIndex.map { case (c, j) => lut(j * model.k + c) }.sum
      assert(math.abs(r.getDouble(2) - expect) < 1e-12)
    }
  }

  test("dim mismatch and null vectors surface as NULL, not garbage codes") {
    val df = Seq(
      (1L, Some(Array.fill(64)(0.5f))),
      (2L, Some(Array.fill(3)(0.5f))), // wrong dim
      (3L, Option.empty[Array[Float]])
    ).toDF("id", "v")
    val out = df.select(col("id"),
        ProductQuantizer.codes(col("v"), model).as("codes"),
        ProductQuantizer.lut(col("v"), model).as("lut"))
      .orderBy("id").collect()
    assert(out(0).getSeq[Int](1).length == model.m)
    assert(out(1).isNullAt(1) && out(1).isNullAt(2))
    assert(out(2).isNullAt(1) && out(2).isNullAt(2))
  }

  test("zero vector encodes without NaN (norm guard)") {
    val df = Seq((1L, Array.fill(64)(0f))).toDF("id", "v")
    val codes = df.select(ProductQuantizer.codes(col("v"), model)).head().getSeq[Int](0)
    assert(codes.length == model.m)
  }

  private def bruteTopK(k: Int): DataFrame = {
    NativeCosine.register(spark)
    val a = emb.select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    val b = emb.select(col("vec_id").as("vec_id"), col("embedding").as("cv"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("probe_id")
      .orderBy(col("cos").desc, col("vec_id").asc)
    a.join(b, col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        call_function(NativeCosine.name, col("cv"), col("pv")).as("cos"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  test("ADC scan + exact re-rank reaches >=0.9 recall@10 vs brute force") {
    val exact = bruteTopK(10).select("probe_id", "vec_id")
      .as[(Long, Long)].collect().toSet
    val pq = ProductQuantizer
      .topK(emb, emb, "vec_id", "embedding", model, k = 10, rerank = 50)
      .select("probe_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact & pq).size.toDouble / exact.size
    info(f"pq recall@10 = $recall%.3f")
    assert(recall >= 0.9, f"recall $recall%.3f below 0.9")
  }

  test("null/wrong-dim corpus rows never crowd the rerank set (NULLS FIRST guard)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // 60 dirty rows > rerank=50: before the isNotNull guard, their NULL
    // adc sorted FIRST and displaced every genuine candidate
    val clean = emb.select("vec_id", "embedding")
    val schema = StructType(Seq(StructField("vec_id", LongType, false),
      StructField("embedding", ArrayType(FloatType, false), true)))
    val dirtyRows = (0 until 60).map { i =>
      Row(100000L + i,
        if (i % 2 == 0) null else Array.fill(3)(0.5f).toSeq)
    }
    val dirty = spark.createDataFrame(
      spark.sparkContext.parallelize(dirtyRows, 2), schema)
    val probes = emb.limit(5)
    val onClean = ProductQuantizer
      .topK(clean, probes, "vec_id", "embedding", model, k = 10, rerank = 50)
      .select("probe_id", "vec_id").as[(Long, Long)].collect().toSet
    val onDirty = ProductQuantizer
      .topK(clean.unionByName(dirty), probes, "vec_id", "embedding",
        model, k = 10, rerank = 50)
      .select("probe_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(onDirty == onClean,
      s"dirty rows changed results: onlyDirty=${(onDirty -- onClean).size}")
    assert(!onDirty.exists(_._2 >= 100000L), "a dirty row reached the top-k")
  }

  test("on-disk IVF-PQ index: codes-only layout, result parity, pruning") {
    val ivf = IvfIndex.train(emb, "embedding", k = 8)
    val dir = java.nio.file.Files.createTempDirectory("graft-pq").toString
    ProductQuantizer.writeIndex(emb, "vec_id", "embedding", model, ivf, dir)
    // the served table carries codes, never raw vectors
    val idx = spark.read.parquet(s"$dir/codes")
    assert(idx.columns.sorted.sameElements(Array("cell", "codes", "vec_id")))
    // result parity with the in-memory composition
    val mem = ProductQuantizer
      .topKIvf(emb, emb.limit(25), "vec_id", "embedding", model, ivf,
        k = 5, nProbe = 4, rerank = 30)
      .select("probe_id", "rn", "vec_id")
      .as[(Long, Int, Long)].collect().toSet
    val diskDf = ProductQuantizer
      .topKIndexed(spark, dir, emb, emb.limit(25), "vec_id", "embedding",
        model, ivf, k = 5, nProbe = 4, rerank = 30)
    val disk = diskDf.select("probe_id", "rn", "vec_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(disk == mem,
      s"on-disk differs: onlyDisk=${(disk -- mem).size} onlyMem=${(mem -- disk).size}")
    // the codes scan is prunable on the cell partition key (dynamic
    // pruning from the probe side — the IvfSpec assertion, same layout)
    val plan = diskDf.queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("dynamicpruning") ||
      plan.contains("partitionfilters: [isnotnull(cell"),
      s"no partition pruning on the cell key:\n$plan")
  }

  test("appendVectors ≡ rebuild: appended IVF-PQ index answers identically") {
    val ivf = IvfIndex.train(emb, "embedding", k = 8)
    val dirA = java.nio.file.Files.createTempDirectory("graft-pq-app").toString
    val dirF = java.nio.file.Files.createTempDirectory("graft-pq-full").toString
    val base = emb.filter(col("vec_id") % 5 =!= 4)
    val batch = emb.filter(col("vec_id") % 5 === 4)
    ProductQuantizer.writeIndex(base, "vec_id", "embedding", model, ivf, dirA)
    ProductQuantizer.appendVectors(dirA, batch, "vec_id", "embedding")
    ProductQuantizer.writeIndex(emb, "vec_id", "embedding", model, ivf, dirF)
    val probes = emb.limit(25)
    def run(d: String) = ProductQuantizer
      .topKIndexed(spark, d, emb, probes, "vec_id", "embedding",
        model, ivf, k = 5, nProbe = 4, rerank = 30)
      .select("probe_id", "rn", "vec_id")
      .as[(Long, Int, Long)].collect().toSet
    val appended = run(dirA)
    assert(appended == run(dirF), "appended index diverges from rebuild")
    // the appended codes rows are identical to the rebuild's for batch ids
    val a = spark.read.parquet(s"$dirA/codes")
      .filter(col("vec_id") % 5 === 4)
      .select(col("vec_id"), col("cell"), col("codes"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSet
    val f = spark.read.parquet(s"$dirF/codes")
      .filter(col("vec_id") % 5 === 4)
      .select(col("vec_id"), col("cell"), col("codes"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSet
    assert(a == f)
  }

  test("removeVectors: takedown codes ≡ an index never built from them") {
    // round-12: delete support for the codes relation — models are
    // untouched, so survivors' codes never change and the compacted
    // relation must equal a write without the removed ids
    val ivf = IvfIndex.train(emb, "embedding", k = 8)
    val dirA = java.nio.file.Files.createTempDirectory("graft-pq-rm").toString
    val dirF = java.nio.file.Files.createTempDirectory("graft-pq-rm2").toString
    val rmPred = IncrementContract.isRemoved(col("vec_id"))
    ProductQuantizer.writeIndex(emb, "vec_id", "embedding", model, ivf, dirA)
    ProductQuantizer.removeVectors(dirA,
      emb.filter(rmPred).select("vec_id"))
    ProductQuantizer.writeIndex(emb.filter(!rmPred), "vec_id", "embedding",
      model, ivf, dirF)
    val a = spark.read.parquet(s"$dirA/codes")
      .select(col("vec_id"), col("cell"), col("codes"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSet
    val f = spark.read.parquet(s"$dirF/codes")
      .select(col("vec_id"), col("cell"), col("codes"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSet
    assert(a == f, "compacted codes diverge from a rebuild without removed ids")
  }

  test("trainDistributed: arithmetic parity with the driver trainer") {
    // a corpus the driver sample covers FULLY, whose values are dyadic
    // (sums exact in double in ANY order) and unit-norm (so PqEncode's
    // multiply-by-reciprocal equals the driver's divide-by-norm) —
    // under those conditions the distributed assign/mean rounds must be
    // bit-identical to the driver Lloyd's iterations, not just close
    import spark.implicits._
    val rows = Seq(
      Seq(1f, 0f, 0f, 0f), Seq(0f, 1f, 0f, 0f),
      Seq(0.5f, 0.5f, 0.5f, 0.5f), Seq(0f, 0f, 1f, 0f),
      Seq(0f, 0f, 0f, 1f), Seq(1f, 0f, 0f, 0f),
      Seq(0.5f, 0.5f, 0.5f, 0.5f), Seq(0f, 1f, 0f, 0f)).toDF("v")
    for (iters <- Seq(1, 3)) {
      val drv = ProductQuantizer.train(rows, "v", m = 2, k = 2, seed = 7L,
        sampleN = 100, iters = iters)
      val dst = ProductQuantizer.trainDistributed(rows, "v", m = 2, k = 2,
        seed = 7L, iters = iters, initSampleN = 100)
      assert(dst.codebooks.flatten.flatten.toSeq ==
        drv.codebooks.flatten.flatten.toSeq,
        s"iters=$iters: distributed k-means diverged from the driver model")
    }
  }

  test("trainDistributed model serves the full search path") {
    // the fixture's operating point (near-isotropic gaussians need the
    // fine m=16/k=64 codebook — same as the driver-trained `model`)
    val dist = ProductQuantizer
      .trainDistributed(emb, "embedding", m = 16, k = 64, iters = 4)
    val exact = bruteTopK(10).select("probe_id", "vec_id")
      .as[(Long, Long)].collect().toSet
    val got = ProductQuantizer
      .topK(emb, emb, "vec_id", "embedding", dist, k = 10, rerank = 50)
      .select("probe_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact & got).size.toDouble / exact.size
    info(f"distributed-trained PQ recall@10 = $recall%.3f")
    assert(recall >= 0.85, f"recall $recall%.3f below 0.85")
  }

  test("IVF-PQ composition keeps recall on probed cells") {
    val ivf = IvfIndex.train(emb, "embedding", k = 8)
    val exact = bruteTopK(10).select("probe_id", "vec_id")
      .as[(Long, Long)].collect().toSet
    val got = ProductQuantizer
      .topKIvf(emb, emb, "vec_id", "embedding", model, ivf, k = 10,
        nProbe = 6, rerank = 50)
      .select("probe_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact & got).size.toDouble / exact.size
    info(f"ivf-pq recall@10 = $recall%.3f (nProbe=6/8 cells)")
    assert(recall >= 0.85, f"recall $recall%.3f below 0.85")
  }
}

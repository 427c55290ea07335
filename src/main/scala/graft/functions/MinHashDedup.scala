package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate detection (SURVEY.md §2.3 J, q_minhash_dedup;
  * the scale path behind the oracle-checked blocking join q_ngram_jaccard).
  *
  * Pipeline (all DataFrame-native, codegen'd, no UDFs):
  *   1. shingle: token n-grams per document (distinct set);
  *   2. signature: K minhashes — min over shingles of xxhash64(shingle, i)
  *      for K independent hash slots;
  *   3. bands: split the signature into B bands of R rows (K = B*R), hash
  *      each band → (band_idx, band_hash) keys;
  *   4. candidates: self-join documents sharing any band bucket (this is
  *      the ONLY join, and it is key-equality on band hash — a shuffled
  *      hash/sort-merge join on bounded buckets, never a cross join);
  *   5. verify: exact Jaccard on the shingle sets of candidate pairs only.
  *
  * At 100 TB: step 4's shuffle is proportional to B × corpus (small, fixed
  * B), and bucket sizes are bounded by hash uniformity; a pathological hot
  * bucket (e.g., empty documents) should be salted or dropped by a bucket-
  * size cap upstream. Jaccard-similar pairs collide in ≥1 band with
  * probability 1-(1-s^R)^B (the standard S-curve).
  */
object MinHashDedup {

  /** Distinct token n-gram shingles of a text column. Documents shorter
    * than n tokens yield an empty shingle set (guarded: Spark's
    * sequence(1, 0) counts DOWN, which would index out of bounds). */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(text, " ")
    if (n == 1) array_distinct(toks)
    else when(size(toks) >= n,
      array_distinct(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(o => element_at(toks, i + o)): _*))))
      .otherwise(typedlit(Seq.empty[String]))
  }

  /** K-slot minhash signature over a shingle-array column. */
  def signature(sh: Column, k: Int): Column =
    array((0 until k).map(i => array_min(transform(sh, s => xxhash64(s, lit(i))))): _*)

  /** Candidate near-dup pairs (idCol pairs, a < b) via banded LSH. */
  def candidatePairs(df: DataFrame, idCol: String, textCol: String,
                     shingleN: Int = 2, bands: Int = 4, rows: Int = 4): DataFrame = {
    val k = bands * rows
    // docs with no shingles (shorter than the shingle width) can't be
    // near-dup candidates — and would otherwise collide into one hot
    // all-null band bucket (and 0/0 under ANSI in the verify step).
    val sig = df.select(col(idCol).as("mh_id"),
        shingles(col(textCol), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("mh_id"), signature(col("sh"), k).as("sig"))
    val banded = sig.select(col("mh_id"),
      posexplode(array((0 until bands).map { b =>
        xxhash64((slice(col("sig"), b * rows + 1, rows) +: Seq(lit(b))): _*)
      }: _*)).as(Seq("band_idx", "band_hash")))
    val a = banded.alias("a")
    val b = banded.alias("b")
    a.join(b,
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.mh_id") < col("b.mh_id"))
      .select(col("a.mh_id").as("a_id"), col("b.mh_id").as("b_id"))
      .distinct()
  }

  /** Verified near-duplicate pairs: LSH candidates filtered by exact
    * Jaccard >= threshold on the shingle sets. */
  def nearDuplicatePairs(df: DataFrame, idCol: String, textCol: String,
                         threshold: Double, shingleN: Int = 2,
                         bands: Int = 4, rows: Int = 4): DataFrame = {
    val sh = df.select(col(idCol).as("sh_id"),
      shingles(col(textCol), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)
    val cands = candidatePairs(df, idCol, textCol, shingleN, bands, rows)
    NativeJaccard.register(df.sparkSession)
    val jac = call_function(NativeJaccard.name, col("sa.sh"), col("sb.sh"))
    cands
      .join(sh.alias("sa"), col("a_id") === col("sa.sh_id"))
      .join(sh.alias("sb"), col("b_id") === col("sb.sh_id"))
      .select(col("a_id"), col("b_id"), jac.as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Dedup: drop every document that near-duplicates a lower-id survivor.
    * (Greedy min-id survivor — one pass, no iterative connected
    * components; at 100 TB chains longer than one hop are rare for high
    * thresholds and can be closed by re-running to a fixpoint.) */
  def dedup(df: DataFrame, idCol: String, textCol: String,
            threshold: Double): DataFrame = {
    val dupIds = nearDuplicatePairs(df, idCol, textCol, threshold)
      .select(col("b_id").as(idCol)).distinct()
    df.join(dupIds, Seq(idCol), "left_anti")
  }
}

package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT set-similarity self-join via prefix filtering — the AllPairs /
  * PPJoin family (Bayardo, Ma & Srikant, "Scaling Up All Pairs Similarity
  * Search", WWW 2007; Xiao et al., PPJoin — public algorithms): every
  * unordered pair of rows whose token-set Jaccard is ≥ t, with NO blocking
  * key and NO probabilistic recall. This is the exact counterpart of the
  * banded-MinHash path (MinHashDedup): LSH trades recall for linearity;
  * prefix filtering keeps exactness and prunes candidates instead.
  *
  * The filter: order every set's tokens by GLOBAL ascending document
  * frequency (rarest first, ties on the token — a total order both join
  * sides agree on) and index only each set's PREFIX — its first
  * |x| − α(|x|) + 1 tokens, where α(n) = ⌈t·n⌉ is the minimum overlap any
  * qualifying partner forces (J ≥ t ⟹ (1+t)·|A∩B| ≥ t·(|A|+|B|) ≥
  * t·(max + |A∩B|) ⟹ |A∩B| ≥ t·max(|A|,|B|) ≥ t·n for either side's n).
  *
  * Why a qualifying pair always shares a PREFIX token (the prefix
  * filtering principle): let c be the SMALLEST common token in the global
  * order. If c sat outside A's prefix, all ≥ α(|A|) common tokens would
  * occupy positions after A's prefix — only α(|A|) − 1 slots — so c is in
  * A's prefix, and symmetrically in B's. Candidates are therefore a
  * key-equality join of prefix postings (narrow rows), pre-pruned by the
  * length filter α(|A|) ≤ |B| ∧ α(|B|) ≤ |A|; the exact Jaccard verify
  * runs once per candidate behind a per-pair aggregate (the PlanDoctor
  * expensive-join-predicate discipline). α is computed in EXACT integer
  * arithmetic from t at 1e-6 granularity rounded DOWN — a double ⌈t·n⌉
  * can round UP across a rational boundary (0.1·10 ⟶ 1.0000000000000002)
  * and silently shorten a prefix; rounding t down only loosens the
  * filter, never loses a pair.
  *
  * Scale posture (100 TB lens): one df aggregate (vocabulary-bounded),
  * one per-set rank window (set-id-partitioned), one posting self-join on
  * the token — shuffle ∝ Σ prefix lengths, candidates ∝ Σ_prefix-token
  * df² — and one broadcast-verify pass. On Zipfian corpora (real text:
  * most features rare) prefixes concentrate on low-df tokens and the
  * candidate count collapses toward the true pair count
  * (SimilarityJoinSpec measures the reduction on a planted Zipfian
  * corpus). On a DENSE shared vocabulary (the synthetic fixtures: <1k
  * distinct bigrams across 50k docs, mean df ≈ 2500) no exact algorithm
  * beats Ω(pairs sharing a rare token) — which is why the engine's
  * production near-dup path at corpus scale stays banded LSH + verify
  * (MinHashDedup), with this join as the exact reference for bounded
  * blocks and recall audits.
  */
object SimilarityJoin {

  /** t at 1e-6 granularity, rounded down — see the class doc. */
  private val TDen = 1000000L

  /** α(n) = ⌈tNum·n / TDen⌉ as a Column. The ceil-div runs as
    * floor((tNum·n + TDen−1) / TDen): the dividend stays < 2^53 for sets
    * up to 9e9 tokens, so the double division is exact. */
  private def alpha(tNum: Long, n: org.apache.spark.sql.Column) =
    floor((n * tNum + lit(TDen - 1)) / lit(TDen)).cast("long")

  /** Prefix postings (w, id, n, rk): each set's first n − α(n) + 1 tokens
    * in global (df asc, token asc) order, carrying the token's 1-based
    * rank rk within its set — the operand of the positional filter. */
  private def prefixPostings(sets: DataFrame, tNum: Long): DataFrame = {
    val dfreq = sets.select(col("id"), explode(col("toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("dfc"))
    sets.select(col("id"), size(col("toks")).cast("long").as("n"),
        explode(col("toks")).as("w"))
      .join(dfreq, "w")
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("id")
          .orderBy(col("dfc").asc, col("w").asc)))
      .filter(col("rk") <= col("n") - alpha(tNum, col("n")) + 1)
      .select(col("w"), col("id"), col("n"), col("rk").cast("long").as("rk"))
  }

  /** Candidate pairs after BOTH filters:
    *   - length filter: α(|A|) ≤ |B| ∧ α(|B|) ≤ |A| (AllPairs);
    *   - POSITIONAL filter (PPJoin, Xiao et al., WWW 2008 — public
    *     algorithm): a shared token at ranks (ra, rb) bounds the overlap
    *     from above — every common token sorts ≥ the shared one in the
    *     global order, so at most min(na − ra, nb − rb) + 1 common tokens
    *     exist — and a qualifying pair needs overlap ≥ α_ab =
    *     ⌈t·(na+nb)/(1+t)⌉ (from J ≥ t ⟺ (1+t)·I ≥ t·(na+nb)). For the
    *     pair's SMALLEST common token the bound is tight in exactly the
    *     prefix-principle sense, so a qualifying pair always survives on
    *     that posting row — recall stays 1 by theorem, while posting rows
    *     whose remaining suffixes can't reach α_ab stop generating
    *     candidates before the distinct.
    * α_ab in exact integer arithmetic with t read as tNum/TDen rounded
    * DOWN (only loosens the filter): ⌈tNum·(na+nb)/(TDen+tNum)⌉ as
    * floor((tNum·(na+nb) + TDen+tNum − 1)/(TDen+tNum)) — the dividend
    * stays < 2^53 (exact double division) for na+nb up to ~4.5e9 tokens. */
  private def candidates(sets: DataFrame, tNum: Long): DataFrame = {
    val ranked = prefixPostings(sets, tNum)
    val na = col("a.n"); val nb = col("b.n")
    val alphaAb = floor(((na + nb) * tNum + lit(TDen + tNum - 1))
      / lit(TDen + tNum)).cast("long")
    val overlapUbound = lit(1L) + least(na - col("a.rk"), nb - col("b.rk"))
    ranked.as("a").join(ranked.as("b"),
        col("a.w") === col("b.w") && col("a.id") < col("b.id") &&
          alpha(tNum, na) <= nb && alpha(tNum, nb) <= na &&
          overlapUbound >= alphaAb)
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .distinct()
  }

  /** The normalized (id, toks) set relation every path starts from: one
    * place owns the set semantics (per-row array_distinct, empty sets
    * dropped) so the fast join, the brute twin, and the candidate metric
    * cannot drift apart. */
  private def sets(df: DataFrame, idCol: String, setCol: String): DataFrame =
    df.select(col(idCol).as("id"), array_distinct(col(setCol)).as("toks"))
      .filter(size(col("toks")) > 0)

  /** All unordered pairs (a_id, b_id, jac) with set-Jaccard ≥ t.
    *
    * @param df     input relation
    * @param idCol  unique row id (orderable; output has a_id < b_id)
    * @param setCol ArrayType(StringType) column; duplicates are collapsed
    *               (set semantics) before any counting
    * @param t      Jaccard threshold in (0, 1], read at 1e-6 granularity
    */
  def jaccardSelfJoin(df: DataFrame, idCol: String, setCol: String,
                      t: Double): DataFrame = {
    require(t > 0 && t <= 1, s"threshold must be in (0, 1], got $t")
    val tNum = math.floor(t * TDen).toLong
    NativeJaccard.register(df.sparkSession)
    val rel = Materialize(sets(df, idCol, setCol))
    val cand = candidates(rel, tNum)
    // exact verify, once per candidate, behind the per-pair aggregate
    // barrier (pairs unique ⇒ min is identity; a bare filter would push
    // the kernel into the join condition). The threshold compares the
    // kernel's double — the SAME comparison bruteForceSelfJoin applies,
    // so the two paths agree row-for-row by construction.
    val jac = call_function(NativeJaccard.name, col("x.toks"), col("y.toks"))
    // NO broadcast hint on the candidate relation: on a dense shared
    // vocabulary (the documented worst case, where prefixes barely prune)
    // candidates approach O(n²) and a forced broadcast would OOM the
    // driver — AQE broadcasts small candidate sets on its own and keeps
    // large ones in a shuffled join, so the bounded-block contract is
    // enforced by the planner rather than advisory.
    cand
      .join(rel.as("x"), col("x.id") === col("a_id"))
      .join(rel.as("y"), col("y.id") === col("b_id"))
      .select(col("a_id"), col("b_id"), jac.as("j"))
      .groupBy("a_id", "b_id").agg(min(col("j")).as("jac"))
      .filter(col("jac") >= t)
  }

  /** Brute-force twin for audits: every pair, no filter — O(n²), bounded
    * inputs only. Same output contract as [[jaccardSelfJoin]]. */
  def bruteForceSelfJoin(df: DataFrame, idCol: String, setCol: String,
                         t: Double): DataFrame = {
    NativeJaccard.register(df.sparkSession)
    val rel = sets(df, idCol, setCol)
    val jac = call_function(NativeJaccard.name, col("x.toks"), col("y.toks"))
    rel.as("x").join(rel.as("y"), col("x.id") < col("y.id"))
      .select(col("x.id").as("a_id"), col("y.id").as("b_id"), jac.as("j"))
      .groupBy("a_id", "b_id").agg(min(col("j")).as("jac"))
      .filter(col("jac") >= t)
  }

  /** The candidate pair count the prefix filter admits — the pruning
    * metric SimilarityJoinSpec asserts against the full posting join. */
  private[graft] def candidateCount(df: DataFrame, idCol: String,
                                    setCol: String, t: Double): Long = {
    val tNum = math.floor(t * TDen).toLong
    candidates(sets(df, idCol, setCol), tNum).count()
  }
}

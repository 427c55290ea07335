package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, explode, lit, pmod, sequence, xxhash64}

/** S×S grid salt for skew-prone self-joins on a blocking key: each row
  * takes a hash-derived grid coordinate on one axis and replicates across
  * the other, so a pair (x, y) meets in EXACTLY cell (cell(x), cell(y)) —
  * the joined result set is identical to the unsalted join while a hot
  * blocking bucket's |B|² work spreads over S² shuffle partitions.
  *
  * Shared by every grid-salted site (q_ngram_jaccard, q_fuzzy_pairs) so
  * the meets-in-exactly-one-cell invariant lives in ONE place: `sides`
  * returns the two aliased frames; the caller's join condition must
  * include `GridSalt.cellMatch` alongside its blocking keys. S is fixed
  * small here; production sizes it from blocking-key stats (AQE skew
  * splitting is the runtime net for SMJ, explicit salting also bounds a
  * shuffled-hash join's build side).
  */
object GridSalt {

  /** The two grid-aliased sides of `df` self-joined on `id`-derived
    * coordinates: side "a" fixes ga = hash(id) mod S and replicates gb;
    * side "b" mirrors. */
  def sides(df: DataFrame, id: Column, s: Int = 4): (DataFrame, DataFrame) = {
    require(s > 0, "grid size must be positive")
    // the grid coordinates are added under fixed names; a caller frame
    // that already carries ga/gb would be silently clobbered and the
    // meets-in-exactly-one-cell invariant broken
    require(!df.columns.exists(c =>
        c.equalsIgnoreCase("ga") || c.equalsIgnoreCase("gb")),
      s"GridSalt.sides: input already has a ga/gb column " +
        s"[${df.columns.mkString(", ")}] — rename it before salting")
    val a = df.withColumn("ga", pmod(xxhash64(id), lit(s)))
      .withColumn("gb", explode(sequence(lit(0), lit(s - 1))))
      .alias("a")
    val b = df.withColumn("gb", pmod(xxhash64(id), lit(s)))
      .withColumn("ga", explode(sequence(lit(0), lit(s - 1))))
      .alias("b")
    (a, b)
  }

  /** The grid-cell conjunct to AND into the self-join condition. */
  def cellMatch: Column =
    col("a.ga") === col("b.ga") && col("a.gb") === col("b.gb")
}

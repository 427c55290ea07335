package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** 64-bit SimHash fingerprints (SURVEY.md §2.3 J — near-dup detection;
  * complements MinHashDedup: SimHash preserves cosine-ish similarity of
  * the token multiset, so near-dups land within a small Hamming ball).
  *
  * Pure Catalyst expressions (HOF fold over token hashes — no UDF, stays
  * in codegen):
  *   counters[b] = Σ_tokens (bit b of xxhash64(token) ? +1 : -1)
  *   simhash bit b = counters[b] > 0
  *
  * At scale the signature is one 8-byte column; near-dup candidate
  * generation partitions by rotated prefixes (the classic Manku et al.
  * approach): any pair within Hamming distance d shares at least one of
  * the d+1 key blocks — [[bucketKeys]] emits those block keys for an
  * equality self-join, avoiding all-pairs comparison.
  */
object SimHash {

  private val Bits = 64

  /** 64-bit SimHash of a token-array column. */
  def signature(tokens: Column): Column = {
    val counters = aggregate(
      transform(tokens, t => xxhash64(t)),
      array_repeat(lit(0), Bits),
      (acc, h) => zip_with(
        acc,
        transform(sequence(lit(0), lit(Bits - 1)),
          b => when(call_function("shiftright", h, b).bitwiseAND(lit(1L)) === 1L,
            lit(1)).otherwise(lit(-1))),
        (x, y) => x + y))
    aggregate(
      sequence(lit(0), lit(Bits - 1)),
      lit(0L),
      (acc, b) => when(element_at(counters, b + 1) > 0,
        acc.bitwiseOR(call_function("shiftleft", lit(1L), b))).otherwise(acc))
  }

  /** Hamming distance between two simhash columns. */
  def hammingDist(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Block keys for Hamming-radius-d candidate joins: split the 64-bit
    * signature into d+1 blocks; two signatures within distance d must
    * agree on at least one block (pigeonhole — d flipped bits cannot touch
    * all d+1 blocks). Returns an array of (block_idx << 56) | block_value
    * keys to explode + equi-join on.
    *
    * Blocks have variable widths (floor(64/n) or +1) so every signature
    * bit is covered even when d+1 does not divide 64 — uncovered bits
    * would silently degrade precision. Widths are <= 32 whenever n >= 2,
    * so block values never overlap the index tag in the top byte; the
    * n == 1 (d = 0) case has tag 0 and the key IS the signature, i.e. an
    * exact-equality join, which is precisely Hamming radius 0. */
  def bucketKeys(sig: Column, d: Int): Column = {
    require(d >= 0 && d < Bits, s"hamming radius must be in [0, $Bits)")
    val nBlocks = d + 1
    val base = Bits / nBlocks
    val extra = Bits % nBlocks // first `extra` blocks take one more bit
    val widths = (0 until nBlocks).map(i => base + (if (i < extra) 1 else 0))
    val starts = widths.scanLeft(0)(_ + _)
    array((0 until nBlocks).map { i =>
      val w = widths(i)
      // (1L << 64) overflows to 1 in Java shift semantics — special-case
      // the full-width mask instead of computing (1L << w) - 1.
      val mask = if (w == Bits) -1L else (1L << w) - 1L
      val block = shiftright(sig, starts(i)).bitwiseAND(lit(mask))
      block.bitwiseOR(shiftleft(lit(i.toLong), 56))
    }: _*)
  }
}

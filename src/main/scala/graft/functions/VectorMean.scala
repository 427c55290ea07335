package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed custom aggregator (SURVEY.md §2.3 K, q_agg_custom): element-wise
  * mean of an ArrayType(FloatType) embedding column.
  *
  * Buffer is (running double sums, count) — merge is element-wise add, so
  * the aggregate is associative/commutative and Spark can partial-aggregate
  * map-side before the shuffle: at 100 TB each partition ships one
  * 64-double buffer per group, not its rows. Double accumulation is used
  * deliberately (float sums drift); the relational oracle twin is
  * q_vector_mean in SimilarityQueries.
  */
object VectorMean {

  case class Buf(sums: Array[Double], n: Long)

  val aggregator: Aggregator[Array[Float], Buf, Array[Float]] =
    new Aggregator[Array[Float], Buf, Array[Float]] {
      override def zero: Buf = Buf(Array.empty[Double], 0L)

      // NULL and empty vectors carry no signal and are excluded from the
      // mean (n counts contributing vectors only); mismatched non-empty
      // lengths are a data error — failing fast beats a silently-truncated
      // mean.
      override def reduce(b: Buf, v: Array[Float]): Buf = {
        if (v == null || v.isEmpty) return b
        if (b.sums.nonEmpty && b.sums.length != v.length)
          throw new IllegalArgumentException(
            s"vector_mean: ragged vector lengths ${b.sums.length} vs ${v.length}")
        val s = if (b.sums.isEmpty) new Array[Double](v.length) else b.sums
        var i = 0
        while (i < v.length) { s(i) += v(i); i += 1 }
        Buf(s, b.n + 1)
      }

      override def merge(a: Buf, b: Buf): Buf = {
        // counts must survive merge even when one side's sums are empty
        if (a.sums.isEmpty) return Buf(b.sums, a.n + b.n)
        if (b.sums.isEmpty) return Buf(a.sums, a.n + b.n)
        if (a.sums.length != b.sums.length)
          throw new IllegalArgumentException(
            s"vector_mean: ragged buffer lengths ${a.sums.length} vs ${b.sums.length}")
        val s = a.sums.clone()
        var i = 0
        while (i < s.length) { s(i) += b.sums(i); i += 1 }
        Buf(s, a.n + b.n)
      }

      override def finish(r: Buf): Array[Float] =
        if (r.n == 0) Array.empty[Float]
        else r.sums.map(s => (s / r.n).toFloat)

      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]

      override def outputEncoder: Encoder[Array[Float]] =
        ExpressionEncoder[Array[Float]]()
    }

  /** `vector_mean(embedding)` as an untyped column for DataFrame agg. */
  def vectorMean(c: Column): Column =
    udaf(aggregator, ExpressionEncoder[Array[Float]]()).apply(c)
}

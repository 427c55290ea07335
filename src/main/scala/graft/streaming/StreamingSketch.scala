package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch KMV distinct-count sketch
  * (`operators/SketchQueries.q_kmv_distinct`): per group, maintain the k
  * smallest distinct 48-bit md5 hashes seen so far — the canonical
  * MERGEABLE sketch, so the streaming state is exactly the batch
  * sketch's aggregation state and the two estimates agree bit-for-bit
  * over the same element multiset (StreamingSpec pins the parity).
  *
  * State per group is ≤ k longs — bounded by construction, no TTL
  * needed; insertion order cannot change the k-min set (PropertySpec
  * pins permutation invariance), which is WHY the estimate is stable
  * across micro-batch boundaries, repartitioning, and replays.
  *
  * 100 TB lens: the grouping key partitions the stream; each key's
  * state is k·8 bytes regardless of stream length. The same state
  * merges across shards (union → k smallest), so a two-level
  * shard-then-merge topology keeps hot groups parallel.
  */
object StreamingSketch {

  case class GroupedToken(group: String, element: String)
  case class KmvEstimate(group: String, n_min: Int, est: Double)

  private val HexScale = 281474976710656L // 16^12 = 2^48

  /** 48-bit md5 prefix of the UTF-8 bytes — the same integer as the
    * batch side's conv(substring(md5(w), 1, 12), 16, 10). */
  private[graft] def hv48(s: String): Long = {
    val b = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    ((b(0) & 0xffL) << 40) | ((b(1) & 0xffL) << 32) |
      ((b(2) & 0xffL) << 24) | ((b(3) & 0xffL) << 16) |
      ((b(4) & 0xffL) << 8) | (b(5) & 0xffL)
  }

  /** Fold elements into a sorted k-min distinct-hash set. A hash ≥ the
    * current kth minimum (with the set full) can never join the k
    * smallest, so dropping it immediately is lossless — the KMV
    * invariant that makes the state bounded AND order-independent. */
  private[graft] def insertAll(set: Vector[Long], elems: Iterator[String],
                               k: Int): Vector[Long] = {
    var s = set
    elems.foreach { e =>
      val h = hv48(e)
      if (s.length < k) {
        if (!s.contains(h)) s = (s :+ h).sorted
      } else if (h < s.last && !s.contains(h)) {
        s = (s.init :+ h).sorted
      }
    }
    s
  }

  /** The estimator — identical arithmetic (and portable round) to the
    * batch query: exact size below k, (k−1)·2⁴⁸/kth at or above. */
  private[graft] def estimate(set: Vector[Long], k: Int): Double = {
    val raw =
      if (set.length < k) set.length.toDouble
      else (k - 1).toDouble * HexScale / set.last
    math.floor(raw * 10000 + 0.5) / 10000
  }

  /** Per-group streaming distinct-count estimates (update mode): each
    * micro-batch emits the group's current (n_min, est). */
  def kmvDistinct(spark: SparkSession, ds: Dataset[GroupedToken],
                  k: Int = 16): Dataset[KmvEstimate] = {
    import spark.implicits._
    require(k >= 2, s"kmv needs k >= 2, got $k")
    ds.groupByKey(_.group)
      .flatMapGroupsWithState[Vector[Long], KmvEstimate](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (group: String, rows: Iterator[GroupedToken],
         state: GroupState[Vector[Long]]) =>
          val prev = if (state.exists) state.get else Vector.empty[Long]
          val next = insertAll(prev, rows.map(_.element), k)
          state.update(next)
          Iterator.single(KmvEstimate(group, next.length, estimate(next, k)))
      }
  }
}

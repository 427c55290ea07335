package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch deterministic eval sample
  * (`operators/SketchQueries.q_eval_sample`): per group, maintain the k
  * docs whose 48-bit md5(id) hashes rank smallest — a bottom-k sample is
  * a MERGEABLE sketch over sets (k-smallest of a union = k-smallest of
  * k-smallest s), so the streaming membership converges to exactly the
  * batch sample over the same corpus regardless of arrival order or
  * batch boundaries (StreamingSpec pins row-for-row parity, ranks
  * included). This is how a training pipeline keeps a live,
  * reproducible held-out split while the corpus streams in: membership
  * is a pure function of the ids seen so far.
  *
  * State per group is ≤ k (hash, id) pairs; replayed ids dedupe on the
  * pair, so at-least-once delivery cannot distort the sample.
  */
object StreamingSample {

  case class KeyedDoc(group: String, doc_id: Long)
  case class SampleMember(group: String, rnk: Int, doc_id: Long)

  /** Per-group streaming bottom-k membership (update mode): each
    * micro-batch emits the group's full current sample (≤ k rows) —
    * downstream replaces the group's membership wholesale. */
  def bottomK(spark: SparkSession, ds: Dataset[KeyedDoc],
              k: Int = graft.operators.SketchQueries.EK): Dataset[SampleMember] = {
    import spark.implicits._
    require(k >= 1, s"sample needs k >= 1, got $k")
    ds.groupByKey(_.group)
      .flatMapGroupsWithState[Vector[(Long, Long)], SampleMember](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (group: String, rows: Iterator[KeyedDoc],
         state: GroupState[Vector[(Long, Long)]]) =>
          var s = if (state.exists) state.get else Vector.empty[(Long, Long)]
          rows.foreach { d =>
            val e = (StreamingSketch.hv48(d.doc_id.toString), d.doc_id)
            if (!s.contains(e)) {
              if (s.length < k) s = (s :+ e).sorted
              else if (implicitly[Ordering[(Long, Long)]].lt(e, s.last))
                s = (s.init :+ e).sorted
            }
          }
          state.update(s)
          s.iterator.zipWithIndex.map { case ((_, id), i) =>
            SampleMember(group, i + 1, id)
          }
      }
  }
}

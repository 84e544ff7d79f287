package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

/** Streaming as-of enrichment — the streaming leg of
  * [[graft.ops.AsOfJoinOps.asofJoin]] and the exact shape of the
  * reference's "attach the latest price to each tweet" join
  * (stream_join.py keeps the most recent per-symbol price beside the tweet
  * stream): every left element is emitted once, carrying the most recent
  * right value for its key with `right.ts <= left.ts` seen so far.
  *
  * Built on `flatMapGroupsWithState` over a UNION of the two streams (the
  * same union trick as the batch op): state per key is ONE (ts, value)
  * pair — O(keys) total, no watermark-dependent growth — versus a
  * stream-stream interval join, whose state buffers every row inside the
  * watermark band on both sides. Within a micro-batch the group iterator
  * is sorted by (ts, side) so right values at the same instant win and
  * replays are deterministic; across micro-batches ordering is
  * watermark-bounded like every streaming join.
  */
object AsOfEnricher {

  /** One element of either stream: `isLeft = false` rows carry the
    * reference value to remember; left rows get enriched.
    */
  final case class Elem(key: String, ts: Timestamp, value: Double,
      isLeft: Boolean)
  final case class LastRight(ts: Long, value: Double)
  final case class Enriched(key: String, ts: Timestamp, value: Double,
      asof_value: Option[Double])

  def union(left: Dataset[(String, Timestamp, Double)],
            right: Dataset[(String, Timestamp, Double)]): Dataset[Elem] = {
    implicit val enc = Encoders.product[Elem]
    left.map { case (k, t, v) => Elem(k, t, v, isLeft = true) }
      .unionByName(right.map { case (k, t, v) =>
        Elem(k, t, v, isLeft = false) })
  }

  def enrich(elems: Dataset[Elem]): Dataset[Enriched] = {
    implicit val outEnc = Encoders.product[Enriched]
    implicit val stateEnc = Encoders.product[LastRight]
    elems.groupByKey(_.key)(Encoders.STRING)
      .flatMapGroupsWithState[LastRight, Enriched](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[Elem], gs: GroupState[LastRight]) =>
          // rights sort before lefts at the same instant => "at or before"
          val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.isLeft))
          val out = Seq.newBuilder[Enriched]
          var st: Option[LastRight] = gs.getOption
          sorted.foreach { e =>
            if (!e.isLeft) {
              if (st.forall(_.ts <= e.ts.getTime))
                st = Some(LastRight(e.ts.getTime, e.value))
            } else {
              val asof = st.collect {
                case LastRight(t, v) if t <= e.ts.getTime => v
              }
              out += Enriched(key, e.ts, e.value, asof)
            }
          }
          st.foreach(gs.update)
          out.result().iterator
      }
  }
}

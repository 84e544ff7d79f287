package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

/** Streaming per-key leaderboard — the streaming leg of
  * [[graft.ops.TopKOps.topKPerGroup]]: maintain the all-time top-k
  * elements per key across micro-batches and re-emit a key's board
  * whenever it changes. The same shape as the reference's rolling
  * "top texts / top users" views, kept incrementally instead of
  * recomputed per window.
  *
  * State per key is the bounded k-entry board itself — O(keys × k)
  * total, the streaming analog of the batch heap node's memory bound —
  * versus windowed rank-over-aggregation, whose state holds every
  * distinct element inside the watermark. Merging a batch is
  * merge-sort-take(k); ties break by id so replays after failure emit
  * identical boards (at-least-once sink idempotence, T8).
  */
object StreamingTopK {

  final case class Scored(key: String, id: Long, value: Double)
  final case class Entry(value: Double, id: Long)
  final case class Board(entries: Seq[Entry])
  final case class TopEntry(key: String, rank: Int, id: Long, value: Double)

  /** Update-mode stream: each micro-batch emits the refreshed board for
    * every key that received data (ranked 1..k, best first).
    */
  def topK(events: Dataset[Scored], k: Int): Dataset[TopEntry] = {
    implicit val outEnc = Encoders.product[TopEntry]
    implicit val stateEnc = Encoders.product[Board]
    events.groupByKey(_.key)(Encoders.STRING)
      .flatMapGroupsWithState[Board, TopEntry](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[Scored], gs: GroupState[Board]) =>
          val cur = gs.getOption.map(_.entries).getOrElse(Seq.empty)
          val merged = (cur ++ it.map(e => Entry(e.value, e.id)))
            .distinct.sortBy(e => (-e.value, e.id)).take(k)
          gs.update(Board(merged))
          merged.zipWithIndex.map { case (e, i) =>
            TopEntry(key, i + 1, e.id, e.value)
          }.iterator
      }
  }
}

package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Inactivity-timeout sessionization on Spark 4 `transformWithState`
  * TIMERS: a key's session accumulates while events keep arriving, and
  * the SUMMARY row is emitted by `handleExpiredTimer` once the key has
  * been quiet for `gapMs` of processing time — each batch slides the
  * key's close-timer forward, so the session closes itself without any
  * event having to arrive (the push-based complement of
  * `session_window`, whose event-time sessions only close when the
  * WATERMARK advances, i.e. when some other event shows up; an ops
  * session feed must close on wall-clock silence too).
  *
  * State per key: one (n, sum) pair + one registered timer — O(active
  * keys), keys hash-partitioned. Within-batch fold order is made
  * deterministic by sorting the batch's rows, so at-least-once replays
  * produce identical summaries.
  */
object StreamingSessionTimeout {

  final case class Hit(key: String, value: Double)
  final case class SessAcc(n: Long, total: Double)
  final case class Summary(key: String, n_events: Long, total_value: Double)

  class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[String, Hit, Summary] {
    @transient private var sess: ValueState[SessAcc] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sess = getHandle.getValueState[SessAcc]("sess",
        Encoders.product[SessAcc], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Hit],
                                 tv: TimerValues): Iterator[Summary] = {
      var acc = if (sess.exists()) sess.get() else SessAcc(0L, 0.0)
      rows.toSeq.sortBy(_.value).foreach { h =>
        acc = SessAcc(acc.n + 1, acc.total + h.value)
      }
      sess.update(acc)
      // slide the inactivity timer: the session now closes gapMs after
      // THIS batch unless another event arrives first
      getHandle.listTimers().foreach(t =>
        getHandle.deleteTimer(t.asInstanceOf[Long]))
      getHandle.registerTimer(tv.getCurrentProcessingTimeInMs() + gapMs)
      Iterator.empty
    }

    override def handleExpiredTimer(key: String, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[Summary] =
      if (!sess.exists()) Iterator.empty
      else {
        val acc = sess.get()
        sess.clear()
        Iterator.single(Summary(key, acc.n, acc.total))
      }
  }

  /** Streaming application: one Summary per closed session. Requires the
    * RocksDB state store provider; like every ProcessingTime-mode
    * transformWithState query, the stream runs continuous timer batches
    * (poll the sink in tests — see [[StreamingEventDedup]]).
    */
  def sessions(hits: Dataset[Hit], gapMs: Long): Dataset[Summary] = {
    require(gapMs > 0, s"gapMs=$gapMs")
    implicit val enc = Encoders.product[Summary]
    hits.groupByKey(_.key)(Encoders.STRING)
      .transformWithState(new SessionProcessor(gapMs),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }
}

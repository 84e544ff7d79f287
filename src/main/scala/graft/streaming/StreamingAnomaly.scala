package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Speed-layer twin of [[graft.ops.TimeSeriesOps.rollingZScoreAnomaly]]:
  * per-key rolling z-score anomaly flags computed continuously, with the
  * last `nRows` observed values carried across micro-batches as keyed
  * state. Each point is scored against the values strictly before it
  * (same self-excluding trailing frame as the batch window), so a spike
  * cannot inflate its own baseline; warm-up (< 2 prior points) and
  * zero-variance baselines flag false, exactly as the batch nullif chain
  * does.
  *
  * Values are Long (quantize currency to cents upstream, as the batch
  * entry does): the baseline's sum/sum-of-squares stay integer-exact, and
  * the double algebra below mirrors the batch expression tree
  * (s/n, (sq - s*s/n)/(n-1), (v-mean)/std) operation-for-operation, so
  * StreamingSpec can pin split-batch == batch-window parity bitwise.
  * That parity means the batch op's MAGNITUDE BOUND applies here too:
  * `nRows * max(|value|)^2` must stay below 2^63 or the Long
  * sum-of-squares wraps silently (see
  * [[graft.ops.TimeSeriesOps.rollingZScoreAnomaly]]).
  *
  * Scale: state is O(nRows) longs per key; keys hash-partition across
  * executors. Within-batch rows are sorted by (ts, value) before folding
  * so at-least-once replays are deterministic.
  */
object StreamingAnomaly {

  final case class Obs(key: String, ts: Timestamp, value: Long)
  final case class RingState(values: Seq[Long])
  final case class Score(key: String, ts: Timestamp, value: Long,
      base_n: Int, zscore: Option[Double], is_anomaly: Boolean)

  /** Score one value against the current baseline window (the batch op's
    * exact arithmetic on integer sums).
    */
  def score(window: Seq[Long], v: Long, z: Double): (Option[Double], Boolean) = {
    val n = window.size
    if (n < 2) (None, false)
    else {
      val s = window.sum
      val sq = window.iterator.map(x => x * x).sum
      val variance = (sq.toDouble - (s * s).toDouble / n) / (n - 1)
      val std = math.sqrt(variance)
      if (!(std > 0.0)) (None, false)
      else {
        val mean = s.toDouble / n
        val zs = (v.toDouble - mean) / std
        (Some(zs), math.abs(zs) > z)
      }
    }
  }

  final case class Baseline(key: String, values: Seq[Long])

  /** [[detect]] with a WARM START: per-key baselines bootstrap from a
    * batch history table via Spark 4's
    * `StatefulProcessorWithInitialState`, so the very first streamed
    * point of a known key is scored against its batch past instead of a
    * cold empty window — the lambda-architecture handoff (batch
    * computes, stream continues) expressed as engine-managed state
    * rather than a hand-rolled side-load. `TimeMode.None` (no TTL/no
    * timers), so the query idles between batches and
    * `processAllAvailable()` behaves normally.
    */
  def detectWithHistory(obs: Dataset[Obs], history: Dataset[Baseline],
                        nRows: Int, z: Double): Dataset[Score] = {
    require(nRows >= 2 && z > 0, s"nRows=$nRows z=$z")
    implicit val scoreEnc = Encoders.product[Score]
    implicit val baseEnc = Encoders.product[Baseline]
    class Proc extends org.apache.spark.sql.streaming
        .StatefulProcessorWithInitialState[String, Obs, Score, Baseline] {
      @transient private var win:
        org.apache.spark.sql.streaming.ValueState[RingState] = _
      override def init(outputMode: OutputMode,
                        timeMode: org.apache.spark.sql.streaming.TimeMode)
          : Unit =
        win = getHandle.getValueState[RingState]("win",
          Encoders.product[RingState],
          org.apache.spark.sql.streaming.TTLConfig.NONE)
      override def handleInitialState(key: String, s: Baseline,
          tv: org.apache.spark.sql.streaming.TimerValues): Unit =
        win.update(RingState(s.values.takeRight(nRows)))
      override def handleInputRows(key: String, rows: Iterator[Obs],
          tv: org.apache.spark.sql.streaming.TimerValues)
          : Iterator[Score] = {
        val sorted = rows.toSeq.sortBy(o => (o.ts.getTime, o.value))
        val out = Seq.newBuilder[Score]
        var window: Seq[Long] =
          if (win.exists()) win.get().values else Seq.empty
        sorted.foreach { o =>
          val (zs, flag) = score(window, o.value, z)
          out += Score(key, o.ts, o.value, window.size, zs, flag)
          window = (window :+ o.value).takeRight(nRows)
        }
        win.update(RingState(window))
        out.result().iterator
      }
    }
    obs.groupByKey(_.key)(Encoders.STRING)
      .transformWithState(new Proc,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append(),
        history.groupByKey(_.key)(Encoders.STRING),
        scoreEnc, baseEnc)
  }

  /** Streaming (or batch) application over a typed Dataset: one Score per
    * observation, AFTER comparing it to the pre-existing baseline.
    */
  def detect(obs: Dataset[Obs], nRows: Int, z: Double): Dataset[Score] = {
    require(nRows >= 2 && z > 0, s"nRows=$nRows z=$z")
    implicit val scoreEnc = Encoders.product[Score]
    implicit val stateEnc = Encoders.product[RingState]
    obs.groupByKey(_.key)(Encoders.STRING)
      .flatMapGroupsWithState[RingState, Score](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[Obs], gs: GroupState[RingState]) =>
          val sorted = it.toSeq.sortBy(o => (o.ts.getTime, o.value))
          val out = Seq.newBuilder[Score]
          var window: Seq[Long] = gs.getOption.fold(Seq.empty[Long])(_.values)
          sorted.foreach { o =>
            val (zs, flag) = score(window, o.value, z)
            out += Score(key, o.ts, o.value, window.size, zs, flag)
            window = (window :+ o.value).takeRight(nRows)
          }
          gs.update(RingState(window))
          out.result().iterator
      }
  }
}

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

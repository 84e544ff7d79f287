package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** X2/T5: per-key online forecaster as keyed state — the Spark-native
  * re-expression of the reference's `ArimaForecastFn` stateful DoFn
  * (dataflow/stream_join.py:349-398: per-symbol model loaded in setup(),
  * `model.update([price]); model.predict(1)` per element).
  *
  * The pmdarima model is replaced by a serializable drift/AR(1)-flavored
  * forecaster (documented divergence, SURVEY.md §7 risk 3): after observing
  * price p_t, forecast p_{t+1} = p_t + beta * (p_t - p_{t-1}), with beta=1
  * (pure drift). Unlike the reference — whose state is worker-local and not
  * checkpointed — `mapGroupsWithState` state is keyed-consistent and
  * checkpointed by Structured Streaming, i.e. strictly better-defined.
  *
  * Scale: state is O(1) per key (two doubles); keys partition across the
  * cluster by hash — no skew beyond key cardinality.
  */
object DriftForecaster {

  final case class Tick(symbol: String, ts: Timestamp, price: Double)
  final case class State(last: Double, prev: Option[Double])
  final case class Forecast(symbol: String, ts: Timestamp, price: Double,
      forecast_next: Double)

  def step(state: Option[State], price: Double): (State, Double) = {
    val drift = state match {
      case Some(State(last, _)) => price - last
      case None                 => 0.0
    }
    (State(price, state.map(_.last)), price + drift)
  }

  /** Streaming (or batch) application over a typed Dataset. In streaming,
    * ticks arrive in micro-batch order; within a batch the group iterator
    * is sorted by time here so replays are deterministic.
    */
  def forecast(ticks: Dataset[Tick]): Dataset[Forecast] = {
    implicit val forecastEnc = Encoders.product[Forecast]
    implicit val stateEnc = Encoders.product[State]
    ticks.groupByKey(_.symbol)(Encoders.STRING)
      .flatMapGroupsWithState[State, Forecast](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (symbol: String, it: Iterator[Tick], gs: GroupState[State]) =>
          val sorted = it.toSeq.sortBy(_.ts.getTime)
          val out = Seq.newBuilder[Forecast]
          var st: Option[State] = gs.getOption
          sorted.foreach { t =>
            val (next, fc) = step(st, t.price)
            st = Some(next)
            out += Forecast(symbol, t.ts, t.price, fc)
          }
          st.foreach(gs.update)
          out.result().iterator
      }
  }
}

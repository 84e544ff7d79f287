package graft.forecast

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** X2 as an aggregate function (the SURVEY.md §7 stretch goal:
  * online-AR-as-aggregate instead of a stateful map): consumes unordered
  * (epoch-ms, price) observations, buffers and sorts at evaluation — the
  * same buffer-then-order discipline Spark's own `percentile` aggregate
  * uses, because aggregation input order is undefined — and emits the
  * final drift forecast for the key.
  *
  * Usable wherever an aggregate fits (GROUP BY, window frames, streaming
  * complete-mode aggs), unlike the `flatMapGroupsWithState` forecaster
  * which owns its group iterator. Merge is buffer concatenation, so the
  * aggregate is commutative/associative as Spark requires; memory is
  * O(points per key) in the buffer, like collect_list/percentile.
  */
object DriftAggregator {

  final case class Obs(ts: Long, price: Double)
  final case class DriftForecast(n: Long, last_price: Double,
      drift: Double, forecast_next: Double)

  val agg: Aggregator[Obs, List[Obs], DriftForecast] =
    new Aggregator[Obs, List[Obs], DriftForecast] {
      override def zero: List[Obs] = Nil
      override def reduce(b: List[Obs], a: Obs): List[Obs] = a :: b
      override def merge(b1: List[Obs], b2: List[Obs]): List[Obs] = b1 ::: b2
      override def finish(buf: List[Obs]): DriftForecast = {
        if (buf.isEmpty) return DriftForecast(0L, Double.NaN, 0.0,
          Double.NaN)
        val sorted = buf.sortBy(o => (o.ts, o.price))
        val last = sorted.last.price
        val drift =
          if (sorted.length < 2) 0.0
          else last - sorted(sorted.length - 2).price
        DriftForecast(sorted.length.toLong, last, drift, last + drift)
      }
      override def bufferEncoder: Encoder[List[Obs]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Obs]]()
      override def outputEncoder: Encoder[DriftForecast] =
        Encoders.product[DriftForecast]
    }
}

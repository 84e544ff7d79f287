package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Speed-layer twin of [[graft.ops.TaOps.taSnapshot]] — the reference's TA
  * records ARE a stream (each poll publishes one indicator snapshot per
  * symbol, coincap/main.py:97-108); this op computes that record shape
  * continuously: per tick, the current EMA-chain MACD, signal line and
  * Wilder RSI for the symbol, with the recursion state carried across
  * micro-batches as keyed state.
  *
  * Same indicator algebra as the batch op (TaOps scaladoc pins the
  * conventions); [[step]] is the single shared transition, and
  * StreamingSpec asserts the stream over split batches reproduces the
  * batch fold exactly — the lambda/kappa parity contract the engine keeps
  * everywhere else (flagship metrics, drift, PSI).
  *
  * Scale: state is O(1) per key (six doubles); keys hash-partition across
  * the cluster. In streaming, within-batch ticks are sorted by (ts, price)
  * here so replays are deterministic (at-least-once safe).
  */
object StreamingTa {

  final case class Tick(symbol: String, ts: Timestamp, price: Double)
  final case class TaState(prev: Double, ef: Double, es: Double,
      sig: Double, au: Option[Double], ad: Option[Double])
  final case class TaPoint(symbol: String, ts: Timestamp, price: Double,
      macd: Double, macd_signal: Double, macd_hist: Double,
      rsi: Option[Double])

  /** One observation's state transition — the same recursions as the
    * batch fold in [[graft.ops.TaOps.taSnapshot]].
    */
  def step(state: Option[TaState], price: Double, aF: Double, aS: Double,
           aG: Double, aW: Double): TaState = state match {
    case None => TaState(price, price, price, 0.0, None, None)
    case Some(s) =>
      val u = math.max(price - s.prev, 0.0)
      val d = math.max(s.prev - price, 0.0)
      val ef = aF * price + (1 - aF) * s.ef
      val es = aS * price + (1 - aS) * s.es
      val sg = aG * (ef - es) + (1 - aG) * s.sig
      TaState(price, ef, es, sg,
        Some(s.au.fold(u)(a => aW * u + (1 - aW) * a)),
        Some(s.ad.fold(d)(a => aW * d + (1 - aW) * a)))
  }

  private def rsiOf(s: TaState): Option[Double] = (s.au, s.ad) match {
    case (Some(au), Some(ad)) =>
      if (ad == 0.0 && au == 0.0) None
      else if (ad == 0.0) Some(100.0)
      else Some(math.min(math.max(
        100.0 - 100.0 / (1.0 + au / ad), 0.0), 100.0))
    case _ => None
  }

  /** The TA record's WINDOWED leg — SMA and VWAP are plain window
    * aggregates, not recursions, so they ride a watermarked tumbling
    * window (map-side partial sums, O(windows × symbols) state, late
    * ticks metered by [[LateDataMonitor]]) rather than keyed state:
    * per (window, symbol) — mean price, Σ(p·vol)/Σ(vol), tick count.
    * Pair with [[indicators]] for the recursive columns; the batch
    * [[graft.ops.TaOps.taSnapshot]] carries both in one row.
    */
  def windowedVwap(ticks: org.apache.spark.sql.DataFrame, dur: String,
                   watermark: String, timeCol: String = "ts",
                   keyCol: String = "symbol", priceCol: String = "price",
                   volCol: String = "vol"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    ticks
      .withWatermark(timeCol, watermark)
      .groupBy(window(col(timeCol), dur), col(keyCol))
      .agg(count(lit(1)).as("n_ticks"),
        avg(col(priceCol)).as("sma"),
        (sum(col(priceCol) * col(volCol)) /
          nullif(sum(col(volCol)), lit(0.0))).as("vwap"))
      .select(col("window.start").as("window_start"), col(keyCol),
        col("n_ticks"), col("sma"), col("vwap"))
  }

  /** Streaming (or batch) application over a typed Dataset: one TaPoint
    * per tick carrying the indicator values AFTER observing it.
    */
  def indicators(ticks: Dataset[Tick], rsiN: Int = 14, fast: Int = 12,
                 slow: Int = 26, signalN: Int = 9): Dataset[TaPoint] = {
    require(fast >= 1 && slow > fast && signalN >= 1 && rsiN >= 1,
      s"bad spans: fast=$fast slow=$slow signal=$signalN rsi=$rsiN")
    val aF = 2.0 / (fast + 1); val aS = 2.0 / (slow + 1)
    val aG = 2.0 / (signalN + 1); val aW = 1.0 / rsiN
    implicit val pointEnc = Encoders.product[TaPoint]
    implicit val stateEnc = Encoders.product[TaState]
    ticks.groupByKey(_.symbol)(Encoders.STRING)
      .flatMapGroupsWithState[TaState, TaPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (symbol: String, it: Iterator[Tick], gs: GroupState[TaState]) =>
          val sorted = it.toSeq.sortBy(t => (t.ts.getTime, t.price))
          val out = Seq.newBuilder[TaPoint]
          var st: Option[TaState] = gs.getOption
          sorted.foreach { t =>
            val next = step(st, t.price, aF, aS, aG, aW)
            st = Some(next)
            val macd = next.ef - next.es
            out += TaPoint(symbol, t.ts, t.price, macd, next.sig,
              macd - next.sig, rsiOf(next))
          }
          st.foreach(gs.update)
          out.result().iterator
      }
  }
}

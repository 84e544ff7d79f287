package graft.schemas

import java.sql.Timestamp
import org.apache.spark.sql.types._

/** Case classes + StructTypes for the reference's record shapes
  * (SURVEY.md §1.3; FIXTURES.md §A). Timestamps are UTC; epoch fields are
  * milliseconds (the reference's authoritative unit — arima.py:111-120).
  */
object Schemas {

  /** raw tweet (twitter/BigData.py:57-66; validator terraform/vm.tf:160-176) */
  final case class Tweet(
      id: String, text: String, author_id: Option[String], crypto_key: String,
      created_at_raw: String, created_at_iso: Timestamp,
      timestamp_ms: Long, timestamp_sec: Long)

  val tweetSchema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("author_id", StringType, nullable = true),
    StructField("crypto_key", StringType, nullable = true),
    StructField("created_at_raw", StringType, nullable = true),
    StructField("created_at_iso", TimestampType, nullable = true),
    StructField("timestamp_ms", LongType, nullable = true),
    StructField("timestamp_sec", LongType, nullable = true)))

  /** raw price, long form post-explode (terraform/vm.tf:178-190) */
  final case class PriceTick(symbol: String, price: Option[Double],
      timestamp: Option[Long])

  val priceTickSchema: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = false),
    StructField("price", DoubleType, nullable = true),
    StructField("timestamp", LongType, nullable = true)))

  /** TA indicator (coincap/main.py:97-108) — schema-only surface in the
    * reference (published but never consumed). */
  val taIndicatorSchema: StructType = StructType(Seq(
    StructField("timestamp", LongType), StructField("symbol", StringType),
    StructField("sma", DoubleType), StructField("rsi", DoubleType),
    StructField("macd", DoubleType), StructField("macd_signal", DoubleType),
    StructField("macd_hist", DoubleType), StructField("vwap24", DoubleType),
    StructField("time", LongType), StructField("date", StringType)))

  /** windowed metrics (dataflow/stream_join.py:421-428;
    * BQ terraform/storage.tf:131-167 — note the REPEATED tweet_texts) */
  final case class WindowedMetrics(
      event_timestamp: Timestamp, symbol: String, tweet_volume: Long,
      avg_price: Option[Double], last_price: Option[Double],
      tweet_texts: Seq[String])

  /** tweet_sentiment (dataflow/stream_join.py:278-286) */
  final case class TweetSentiment(
      event_timestamp: String, symbol: String, text: String,
      sentiment_score: Option[Double], sentiment_magnitude: Option[Double],
      sentiment_label: Option[String], action_signal: Option[String])

  /** price_forecasts (dataflow/stream_join.py:370-378) */
  final case class PriceForecast(
      event_timestamp: String, symbol: String, price: Double,
      price_timestamp: Long, arima_next_price_forecast: Option[Double])
}

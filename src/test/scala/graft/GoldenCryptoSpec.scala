package graft

import java.sql.Timestamp
import graft.ops.CryptoPipeline
import graft.schemas.Schemas
import graft.sources.Sources

/** Golden-file test of the reference's own flagship slice
  * (`build_windowed_metrics`, batch_to_mongo.py:201-238) over
  * reference-shaped fixtures (FIXTURES.md §A schemas; fixture data is our
  * own, shaped to the reference's record layout).
  */
class GoldenCryptoSpec extends SparkSpec {

  import spark.implicits._

  private def res(name: String): String =
    getClass.getResource(s"/fixtures/$name").getPath

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowed crypto metrics over JSON fixtures match golden rows") {
    val tweets = Sources.jsonArray(spark, Schemas.tweetSchema,
      res("tweets.json"))
    assert(tweets.count() === 5)
    val wide = spark.read.json(res("prices_wide.jsonl"))
    val prices = CryptoPipeline.explodePrices(wide,
      Seq("ETH", "SOL", "FTM", "SHIB"))
    assert(prices.count() === 6)

    val out = CryptoPipeline.windowedCryptoMetrics(tweets, prices,
      "30 seconds")
    val rows = out.collect().map { r =>
      (r.getAs[Timestamp]("window_start").toString,
        r.getAs[String]("symbol")) ->
        (r.getAs[Long]("tweet_volume"),
          Option(r.getAs[java.lang.Double]("avg_price")).map(_.doubleValue),
          Option(r.getAs[java.lang.Double]("last_price")).map(_.doubleValue),
          Option(r.getAs[scala.collection.Seq[String]]("tweet_texts"))
            .map(_.toList))
    }.toMap

    assert(rows.size === 5)
    val w0 = "2025-12-29 15:41:00.0"
    val w1 = "2025-12-29 15:41:30.0"
    assert(rows((w0, "ETH")) === ((2L, Some(3005.0), Some(3010.0),
      Some(List("ETH looking strong", "ETH to the moon")))))
    assert(rows((w0, "SOL")) === ((1L, Some(150.0), Some(150.0),
      Some(List("selling all my SOL")))))
    assert(rows((w0, "SHIB")) === ((0L, Some(1.0e-5), Some(1.0e-5), None)))
    assert(rows((w1, "ETH")) === ((1L, Some(3020.0), Some(3020.0),
      Some(List("ETH dip incoming")))))
    assert(rows((w1, "FTM")) === ((0L, Some(0.5), Some(0.5), None)))
    // the null-crypto_key tweet (P1) is dropped: no null-symbol row
    assert(!rows.keys.exists(_._2 == null))
  }

  test("CryptoStreamJob runs the speed layer end-to-end on the fixtures") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val root = Files.createTempDirectory("crypto_stream").toString
    Seq("tweets", "prices").foreach(d =>
      Files.createDirectories(Paths.get(root, d)))
    // tweet fixture is a JSON array; the file stream wants JSON lines
    val tweetRows = Sources.jsonArray(spark, Schemas.tweetSchema,
      res("tweets.json"))
    tweetRows.toJSON.collect().zipWithIndex.foreach { case (line, i) =>
      Files.write(Paths.get(root, "tweets", s"t$i.json"),
        line.getBytes("UTF-8"))
    }
    Files.copy(Paths.get(res("prices_wide.jsonl")),
      Paths.get(root, "prices", "p0.json"),
      StandardCopyOption.REPLACE_EXISTING)

    val q = graft.streaming.CryptoStreamJob.start(spark,
      s"$root/tweets", s"$root/prices",
      Seq("ETH", "SOL", "FTM", "SHIB"),
      s"$root/out", s"$root/ckpt")
    try q.processAllAvailable() finally q.stop()

    val out = spark.read.parquet(s"$root/out")
    // all files land in one micro-batch -> same five golden windows
    assert(out.count() === 5)
    val eth = out.filter($"symbol" === "ETH" &&
      $"window_start" === ts("2025-12-29 15:41:00")).collect().head
    assert(eth.getAs[Long]("tweet_volume") === 2L)
    assert(eth.getAs[Double]("last_price") === 3010.0)
    assert(eth.getAs[Timestamp]("event_timestamp") ===
      ts("2025-12-29 15:41:30")) // speed layer stamps window END (F7)
  }

  test("sentiment + forecast surfaces compose on the same fixture (X1/X2)") {
    val tweets = Sources.jsonArray(spark, Schemas.tweetSchema,
      res("tweets.json"))
    val scored = graft.ops.TextOps.sentiment(tweets,
      posWords = Seq("moon", "strong"), negWords = Seq("selling", "dip"))
    val bySignal = scored.collect()
      .map(r => r.getAs[String]("id") -> r.getAs[String]("action_signal"))
      .toMap
    assert(bySignal("t1") === "buy")   // "to the moon"
    assert(bySignal("t2") === "sell")  // "selling"
    assert(bySignal("t5") === "sell")  // "dip"
  }
}

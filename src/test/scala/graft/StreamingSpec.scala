package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{DriftForecaster, StreamingMetrics}

/** Structured Streaming semantics (SURVEY.md §2.10): event-time windows,
  * watermark late-data drop (T4 — Beam allowed_lateness=0), keyed state
  * (T5). MemoryStream drives micro-batches synchronously.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  final case class Ev(ts: Timestamp, event_type: String, value: Double)

  test("watermarked windowed metrics drop late rows in append mode (T2/T4)") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[Ev]
    val out = StreamingMetrics.windowedMetrics(mem.toDF(), "30 seconds",
      "30 seconds")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("wm").start()
    try {
      // batch 1: two events in window :00, watermark then advances far
      mem.addData(Ev(ts("2024-01-01 00:00:05"), "A", 10.0),
        Ev(ts("2024-01-01 00:00:10"), "A", 20.0))
      q.processAllAvailable()
      mem.addData(Ev(ts("2024-01-01 00:10:00"), "A", 1.0)) // advances wm
      q.processAllAvailable()
      // batch 3: late event for the long-closed :00 window -> dropped
      mem.addData(Ev(ts("2024-01-01 00:00:20"), "A", 999.0))
      q.processAllAvailable()
      mem.addData(Ev(ts("2024-01-01 00:20:00"), "A", 2.0)) // close :10 win
      q.processAllAvailable()
      val rows = spark.table("wm").collect()
      val w0 = rows.find(_.getAs[Timestamp]("window_start") ==
        ts("2024-01-01 00:00:00")).get
      assert(w0.getAs[Long]("n_events") === 2L)   // late 999.0 NOT counted
      assert(w0.getAs[Double]("avg_value") === 15.0)
      assert(w0.getAs[Double]("last_value") === 20.0)
    } finally q.stop()
  }

  test("late-data drops are metered, not silent (T4 observability)") {
    implicit val sql = spark.sqlContext
    val monitor = new graft.streaming.LateDataMonitor
    spark.streams.addListener(monitor)
    val mem = MemoryStream[Ev]
    val out = StreamingMetrics.windowedMetrics(mem.toDF(), "30 seconds",
      "30 seconds")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("wm_late").start()
    try {
      mem.addData(Ev(ts("2024-01-01 00:00:05"), "A", 10.0))
      q.processAllAvailable()
      mem.addData(Ev(ts("2024-01-01 00:10:00"), "A", 1.0)) // advances wm
      q.processAllAvailable()
      // two late events for the long-closed :00 window -> dropped.
      // Distinct keys: the drop is metered at the stateful operator,
      // after map-side partial aggregation, so same-group late rows
      // collapse to one dropped state update (LateDataMonitor scaladoc)
      mem.addData(Ev(ts("2024-01-01 00:00:20"), "A", 999.0),
        Ev(ts("2024-01-01 00:00:25"), "B", 998.0))
      q.processAllAvailable()
      // synchronous surface: the query's own progress metering
      assert(graft.streaming.LateDataMonitor.droppedByWatermark(q) === 2L)
      // listener surface: progress events arrive on the async bus
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (monitor.droppedRows("wm_late") < 2L &&
             System.nanoTime() < deadline) Thread.sleep(50)
      assert(monitor.droppedRows("wm_late") === 2L)
    } finally {
      q.stop()
      spark.streams.removeListener(monitor)
    }
  }

  test("streaming TA indicators carry recursion state across " +
       "micro-batches and match the batch fold (TaOps twin)") {
    implicit val sql = spark.sqlContext
    import graft.streaming.StreamingTa
    val mem = MemoryStream[StreamingTa.Tick]
    val out = StreamingTa.indicators(mem.toDS())
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sta").start()
    val prices = Seq(10.0, 12.0, 11.0, 15.0, 9.0, 14.0)
    val ticks = prices.zipWithIndex.map { case (p, i) =>
      StreamingTa.Tick("btc", ts(s"2024-01-01 00:0$i:00"), p)
    }
    try {
      // split mid-series: the EMA/Wilder state must survive the boundary
      mem.addData(ticks.take(3): _*)
      q.processAllAvailable()
      mem.addData(ticks.drop(3): _*)
      q.processAllAvailable()
      val rows = spark.table("sta").collect()
      assert(rows.length === prices.length, "one TaPoint per tick")
      val last = rows.maxBy(_.getAs[Timestamp]("ts").getTime)
      // batch twin over the same series (vol irrelevant to these cols)
      val batch = graft.ops.TaOps.taSnapshot(
        ticks.map(t => ("btc", t.ts, t.price, 1.0))
          .toDF("sym", "t", "p", "vol"), "sym", "t", "p", "vol")
        .collect().head
      def r6(x: Double) = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r6(last.getAs[Double]("macd")) === batch.getAs[Double]("macd"))
      assert(r6(last.getAs[Double]("macd_signal")) ===
        batch.getAs[Double]("macd_signal"))
      assert(r6(last.getAs[Double]("macd_hist")) ===
        batch.getAs[Double]("macd_hist"))
      assert(r6(last.getAs[Double]("rsi")) === batch.getAs[Double]("rsi"))
    } finally q.stop()
  }

  test("streaming windowed VWAP/SMA: closed windows emit once, zero " +
       "volume yields null vwap") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double, Double)]
    val out = graft.streaming.StreamingTa.windowedVwap(
      mem.toDF().toDF("ts", "symbol", "price", "vol"),
      "1 minute", "30 seconds")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("wvwap").start()
    try {
      mem.addData(
        (ts("2024-01-01 00:00:10"), "btc", 10.0, 2.0),
        (ts("2024-01-01 00:00:40"), "btc", 20.0, 6.0),
        (ts("2024-01-01 00:00:50"), "eth", 5.0, 0.0))
      q.processAllAvailable()
      mem.addData((ts("2024-01-01 00:05:00"), "btc", 1.0, 1.0)) // close :00
      q.processAllAvailable()
      val rows = spark.table("wvwap").collect()
        .map(r => r.getString(1) -> r).toMap
      val b = rows("btc")
      assert(b.getAs[Long]("n_ticks") === 2L)
      assert(b.getAs[Double]("sma") === 15.0)
      assert(b.getAs[Double]("vwap") === (10.0 * 2 + 20.0 * 6) / 8.0)
      // all-zero volume in the window: vwap is null, not a div-by-zero
      val e = rows("eth")
      assert(e.isNullAt(e.fieldIndex("vwap")))
      assert(e.getAs[Double]("sma") === 5.0)
    } finally q.stop()
  }

  test("drift forecaster keeps per-key state across micro-batches (X2/T5)") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[DriftForecaster.Tick]
    val out = DriftForecaster.forecast(mem.toDS())
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("fc").start()
    try {
      mem.addData(
        DriftForecaster.Tick("ETH", ts("2024-01-01 00:00:00"), 100.0),
        DriftForecaster.Tick("ETH", ts("2024-01-01 00:00:15"), 110.0))
      q.processAllAvailable()
      // state (last=110) must survive into the next micro-batch
      mem.addData(
        DriftForecaster.Tick("ETH", ts("2024-01-01 00:00:30"), 130.0),
        DriftForecaster.Tick("SOL", ts("2024-01-01 00:00:30"), 50.0))
      q.processAllAvailable()
      val rows = spark.table("fc").collect()
        .map(r => (r.getAs[String]("symbol"), r.getAs[Double]("price")) ->
          r.getAs[Double]("forecast_next")).toMap
      assert(rows(("ETH", 100.0)) === 100.0) // first obs: zero drift
      assert(rows(("ETH", 110.0)) === 120.0) // drift +10
      assert(rows(("ETH", 130.0)) === 150.0) // cross-batch drift +20
      assert(rows(("SOL", 50.0)) === 50.0)   // independent key state
    } finally q.stop()
  }

  test("cogrouped metrics join emits rows for single-sided keys (J1)") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[Ev2]
    var captured: Seq[org.apache.spark.sql.Row] = Nil
    val writer = StreamingMetrics.cogroupedMetricsSink(
      mem.toDF(), Seq("click"), Seq("purchase"), "30 seconds", "30 seconds") {
      (df, _) => val rows = df.collect(); if (rows.nonEmpty) captured = rows
    }
    val q = writer.start()
    try {
      mem.addData(
        Ev2(ts("2024-01-01 00:00:05"), "click", 7L, 1.0),
        Ev2(ts("2024-01-01 00:00:10"), "purchase", 8L, 2.0))
      q.processAllAvailable()
      mem.addData(Ev2(ts("2024-01-01 00:10:00"), "click", 7L, 1.0))
      q.processAllAvailable() // watermark passes, append emits window :00
      assert(captured.nonEmpty)
      val bySide = captured.map(r => r.getAs[Long]("user_id") ->
        (Option(r.getAs[java.lang.Long]("n_a")),
         Option(r.getAs[java.lang.Long]("n_b")))).toMap
      assert(bySide(7L) === (Some(1L), None)) // click-only key present
      assert(bySide(8L) === (None, Some(1L))) // purchase-only key present
    } finally q.stop()
  }

  final case class Ev2(ts: Timestamp, event_type: String, user_id: Long,
      value: Double)

  test("file source -> windowed agg -> parquet sink w/ checkpoint (S4/T7/K3)") {
    import java.nio.file.{Files, Paths}
    val root = Files.createTempDirectory("graft_stream").toString
    val in = s"$root/in"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    Files.createDirectories(Paths.get(in))
    def writeFile(name: String, lines: Seq[String]): Unit =
      Files.write(Paths.get(in, name),
        lines.mkString("\n").getBytes("UTF-8"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ts_ms",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType)))
    val base = ts("2024-01-01 00:00:00").getTime
    writeFile("f1.json", Seq(
      s"""{"ts_ms": ${base + 5000}, "event_type": "A", "value": 10.0}""",
      s"""{"ts_ms": ${base + 10000}, "event_type": "A", "value": 20.0}"""))
    val stream = StreamingMetrics
      .fileStream(spark, schema, in)
      .withColumn("ts", timestamp_millis(col("ts_ms")))
    val agg = StreamingMetrics.windowedMetrics(stream, "30 seconds",
      "30 seconds")
    val q = agg.writeStream.outputMode("append").format("parquet")
      .option("path", out).option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      // second file advances the watermark, closing window :00
      writeFile("f2.json", Seq(
        s"""{"ts_ms": ${base + 600000}, "event_type": "A", "value": 1.0}"""))
      q.processAllAvailable()
    } finally q.stop()
    val result = spark.read.parquet(out)
      .filter(col("window_start") === ts("2024-01-01 00:00:00")).collect()
    assert(result.length === 1)
    assert(result.head.getAs[Long]("n_events") === 2L)
    assert(result.head.getAs[Double]("last_value") === 20.0)
  }

  test("checkpoint recovery: restarting the query resumes exactly-once " +
       "(no replayed or lost windows) (T8)") {
    import java.nio.file.{Files, Paths}
    val root = Files.createTempDirectory("graft_ckpt").toString
    val in = s"$root/in"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    Files.createDirectories(Paths.get(in))
    def writeFile(name: String, lines: Seq[String]): Unit =
      Files.write(Paths.get(in, name),
        lines.mkString("\n").getBytes("UTF-8"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ts_ms",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType)))
    val base = ts("2024-01-01 00:00:00").getTime
    def start() = {
      val stream = StreamingMetrics.fileStream(spark, schema, in)
        .withColumn("ts", timestamp_millis(col("ts_ms")))
      StreamingMetrics.windowedMetrics(stream, "30 seconds", "30 seconds")
        .writeStream.outputMode("append").format("parquet")
        .option("path", out).option("checkpointLocation", ckpt).start()
    }
    // lifetime 1: two rows in window :00, then a watermark push closes it
    writeFile("f1.json", Seq(
      s"""{"ts_ms": ${base + 1000}, "event_type": "A", "value": 1.0}""",
      s"""{"ts_ms": ${base + 2000}, "event_type": "A", "value": 2.0}"""))
    val q1 = start()
    try {
      q1.processAllAvailable()
      writeFile("f2.json", Seq(
        s"""{"ts_ms": ${base + 600000}, "event_type": "A", "value": 3.0}"""))
      q1.processAllAvailable()
    } finally q1.stop()
    // lifetime 2: SAME checkpoint — f1/f2 must not replay into the sink;
    // a new watermark push closes the :10:00 window exactly once
    writeFile("f3.json", Seq(
      s"""{"ts_ms": ${base + 1200000}, "event_type": "A", "value": 4.0}"""))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val rows = spark.read.parquet(out).collect()
      .map(r => r.getAs[java.sql.Timestamp]("window_start") ->
        (r.getAs[Long]("n_events"), r.getAs[Double]("last_value")))
    // every closed window appears EXACTLY once with its full contents
    assert(rows.length === rows.map(_._1).distinct.length,
      s"replayed windows: ${rows.mkString(", ")}")
    val m = rows.toMap
    assert(m(ts("2024-01-01 00:00:00")) === ((2L, 2.0)))
    assert(m(ts("2024-01-01 00:10:00")) === ((1L, 3.0)))
  }

  test("stream-stream banded inner join pairs rows across streams (J1-inner)") {
    implicit val sql = spark.sqlContext
    val tweets = MemoryStream[Ev]
    val prices = MemoryStream[Ev]
    val joined = StreamingMetrics.streamStreamJoin(
      tweets.toDF(), prices.toDF(), "event_type", "30 seconds",
      bandSeconds = 15)
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj").start()
    try {
      tweets.addData(Ev(ts("2024-01-01 00:00:10"), "ETH", 1.0))
      prices.addData(
        Ev(ts("2024-01-01 00:00:05"), "ETH", 3000.0),  // within 15s band
        Ev(ts("2024-01-01 00:00:50"), "ETH", 3010.0),  // outside band
        Ev(ts("2024-01-01 00:00:05"), "SOL", 150.0))   // other key
      q.processAllAvailable()
      // advance both watermarks so pending state flushes
      tweets.addData(Ev(ts("2024-01-01 00:10:00"), "ETH", 2.0))
      prices.addData(Ev(ts("2024-01-01 00:10:00"), "ETH", 3020.0))
      q.processAllAvailable()
      val rows = spark.table("ssj")
        .filter($"l_value" === 1.0)
        .select($"event_type", $"r_value").collect()
      assert(rows.length === 1) // only the in-band ETH price pairs
      assert(rows.head.getAs[Double]("r_value") === 3000.0)
    } finally q.stop()
  }

  test("Trigger.AvailableNow catches up a backlog then stops (T7)") {
    import java.nio.file.{Files, Paths}
    val root = Files.createTempDirectory("graft_avnow").toString
    val in = s"$root/in"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    Files.createDirectories(Paths.get(in))
    (0 until 3).foreach { i =>
      Files.write(Paths.get(in, s"f$i.json"),
        (0 until 10).map(j =>
          s"""{"ts_ms": ${1704067200000L + (i * 10 + j) * 1000}, "v": $j}""")
          .mkString("\n").getBytes("UTF-8"))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ts_ms",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType)))
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(in)
      .writeStream.outputMode("append").format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000) // AvailableNow terminates after the backlog
    assert(!q.isActive, "AvailableNow query should self-terminate")
    assert(spark.read.parquet(out).count() === 30L)
  }

  test("streaming dedup drops in-watermark duplicates, state bounded") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[Ev]
    val out = StreamingMetrics.dedupStream(mem.toDF(), "ts", "10 minutes",
      Seq("event_type", "value"))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("dedup").start()
    try {
      mem.addData(
        Ev(ts("2024-01-01 00:00:05"), "A", 1.0),
        Ev(ts("2024-01-01 00:00:06"), "A", 1.0), // dup content
        Ev(ts("2024-01-01 00:00:07"), "B", 2.0))
      q.processAllAvailable()
      mem.addData(Ev(ts("2024-01-01 00:01:00"), "A", 1.0)) // still in wm
      q.processAllAvailable()
      val n = spark.table("dedup").count()
      assert(n === 2L) // one A-1.0 survivor + one B-2.0
    } finally q.stop()
  }

  test("stream-static broadcast join enriches without streaming state") {
    // dimension enrichment is stateless: each micro-batch joins against
    // the static side (re-resolved per batch), no watermark needed
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[Ev]
    val dims = Seq(("A", "alpha"), ("B", "beta")).toDF("event_type", "label")
    val out = mem.toDF().join(broadcast(dims), Seq("event_type"), "left")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("dimjoin").start()
    try {
      mem.addData(Ev(ts("2024-01-01 00:00:01"), "A", 1.0),
        Ev(ts("2024-01-01 00:00:02"), "C", 3.0))
      q.processAllAvailable()
      mem.addData(Ev(ts("2024-01-01 00:00:03"), "B", 2.0))
      q.processAllAvailable()
      val rows = spark.table("dimjoin").collect()
        .map(r => r.getAs[String]("event_type") ->
          Option(r.getAs[String]("label"))).toMap
      assert(rows("A") === Some("alpha"))
      assert(rows("B") === Some("beta"))
      assert(rows("C") === None) // unmatched dim -> null, row kept
    } finally q.stop()
  }

  test("streaming session windows merge within gap, split across it") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[Ev]
    val out = StreamingMetrics.sessionMetrics(mem.toDF(), "30 seconds",
      "10 seconds")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sess").start()
    try {
      // burst 1: two events 10s apart (same session); burst 2 at :01:30
      // (gap > 30s -> new session), delivered across separate batches to
      // prove open-session state merges across micro-batches
      mem.addData(Ev(ts("2024-01-01 00:00:00"), "A", 1.0))
      q.processAllAvailable()
      mem.addData(Ev(ts("2024-01-01 00:00:10"), "A", 2.0))
      q.processAllAvailable()
      mem.addData(Ev(ts("2024-01-01 00:01:30"), "A", 4.0))
      q.processAllAvailable()
      mem.addData(Ev(ts("2024-01-01 00:30:00"), "A", 0.0)) // advance wm
      q.processAllAvailable()
      val rows = spark.table("sess").collect()
        .map(r => (r.getAs[Timestamp]("session_start"),
          r.getAs[Timestamp]("session_end"), r.getAs[Long]("n_events"),
          r.getAs[Double]("sum_value"))).sortBy(_._1.getTime)
      assert(rows.length >= 2)
      // session 1: [00:00:00, 00:00:40) — second event extended it
      assert(rows(0)._1 === ts("2024-01-01 00:00:00"))
      assert(rows(0)._2 === ts("2024-01-01 00:00:40"))
      assert(rows(0)._3 === 2L && rows(0)._4 === 3.0)
      // session 2: singleton burst [00:01:30, 00:02:00)
      assert(rows(1)._1 === ts("2024-01-01 00:01:30"))
      assert(rows(1)._2 === ts("2024-01-01 00:02:00"))
      assert(rows(1)._3 === 1L && rows(1)._4 === 4.0)
    } finally q.stop()
  }

  test("unbounded rate source wires into windowed metrics (S1 stand-in)") {
    // the rate source is the built-in unbounded generator — proves the
    // same windowedMetrics plan runs against a genuinely unbounded source
    val rate = spark.readStream.format("rate")
      .option("rowsPerSecond", 500).load()
      .select(col("timestamp").as("ts"),
        (col("value") % 3).cast("string").as("event_type"),
        col("value").cast("double").as("value"))
    val agg = StreamingMetrics.windowedMetrics(rate, "1 second", "0 seconds")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("rate_wm").start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      var n = 0L
      while (n == 0 && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        n = spark.table("rate_wm").count()
        if (n == 0) Thread.sleep(500)
      }
      assert(n > 0, "rate-source windows never closed")
    } finally q.stop()
  }

  test("per-element model scoring over a stream (T6/X1)") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val scored = graft.ops.TextOps.sentiment(
      mem.toDF().toDF("doc_id", "text"))
    val q = scored.writeStream.outputMode("append")
      .format("memory").queryName("sent").start()
    try {
      mem.addData((1L, "fast big win"), (2L, "slow small loss"))
      q.processAllAvailable()
      val rows = spark.table("sent").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          r.getAs[String]("action_signal")).toMap
      assert(rows(1L) === "buy")
      assert(rows(2L) === "sell")
    } finally q.stop()
  }

  test("streaming as-of enrichment carries latest right value across " +
      "micro-batches with O(keys) state") {
    import graft.streaming.AsOfEnricher
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[AsOfEnricher.Elem]
    val out = AsOfEnricher.enrich(mem.toDS())
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("asof").start()
    try {
      // batch 1: price then tweet at same instant, then later tweet
      mem.addData(
        AsOfEnricher.Elem("ETH", ts("2024-01-01 00:00:10"), 100.0,
          isLeft = false),
        AsOfEnricher.Elem("ETH", ts("2024-01-01 00:00:10"), 1.0,
          isLeft = true),
        AsOfEnricher.Elem("ETH", ts("2024-01-01 00:00:20"), 2.0,
          isLeft = true),
        AsOfEnricher.Elem("SOL", ts("2024-01-01 00:00:05"), 3.0,
          isLeft = true))
      q.processAllAvailable()
      // batch 2: the remembered 100.0 must survive; then a fresher price
      mem.addData(
        AsOfEnricher.Elem("ETH", ts("2024-01-01 00:01:00"), 4.0,
          isLeft = true),
        AsOfEnricher.Elem("ETH", ts("2024-01-01 00:01:30"), 150.0,
          isLeft = false),
        AsOfEnricher.Elem("ETH", ts("2024-01-01 00:02:00"), 5.0,
          isLeft = true))
      q.processAllAvailable()
      val rows = spark.table("asof").collect()
        .map(r => r.getAs[Double]("value") ->
          Option(r.getAs[Any]("asof_value"))).toMap
      assert(rows(1.0) === Some(100.0)) // same-instant right wins
      assert(rows(2.0) === Some(100.0))
      assert(rows(3.0) === None)        // no right row for SOL
      assert(rows(4.0) === Some(100.0)) // state crossed the batch boundary
      assert(rows(5.0) === Some(150.0)) // fresher right applied
    } finally q.stop()
  }

  test("streaming top-k leaderboard evolves across micro-batches") {
    import graft.streaming.StreamingTopK
    import graft.streaming.StreamingTopK.Scored
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[Scored]
    val q = StreamingTopK.topK(mem.toDS(), k = 2)
      .writeStream.outputMode("update")
      .format("memory").queryName("lb").start()
    try {
      mem.addData(Scored("A", 1L, 10.0), Scored("A", 2L, 30.0),
        Scored("A", 3L, 20.0), Scored("B", 9L, 1.0))
      q.processAllAvailable()
      val b1 = spark.table("lb").collect()
        .map(r => (r.getString(0), r.getInt(1)) ->
          (r.getLong(2), r.getDouble(3))).toMap
      assert(b1(("A", 1)) === ((2L, 30.0)))
      assert(b1(("A", 2)) === ((3L, 20.0))) // id 1 (10.0) fell off, k=2
      assert(b1(("B", 1)) === ((9L, 1.0)))

      // batch 2: a new high for A; B unchanged => no new B rows
      mem.addData(Scored("A", 4L, 99.0))
      q.processAllAvailable()
      val all = spark.table("lb").collect()
      val b2 = all.drop(b1.size)
        .map(r => (r.getString(0), r.getInt(1)) ->
          (r.getLong(2), r.getDouble(3))).toMap
      assert(b2(("A", 1)) === ((4L, 99.0))) // cross-batch state merged
      assert(b2(("A", 2)) === ((2L, 30.0)))
      assert(!b2.keySet.exists(_._1 == "B"), "B had no batch-2 data")
    } finally q.stop()
  }

  test("streaming PSI drift alarm: a reference-shaped window scores " +
      "near zero, a shifted window scores high") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[Ev]
    // reference: uniform over [0, 10) in 2 bins -> smoothed shares 0.5/0.5
    val out = StreamingMetrics.psiDriftStream(mem.toDF(),
      refShares = Seq(0.5, 0.5), lo = 0.0, hi = 10.0,
      windowDur = "30 seconds", watermark = "0 seconds")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("drift").start()
    try {
      // window :00 balanced (4 low + 4 high), window :30 all-high
      val w0 = (1 to 4).map(i => Ev(ts("2024-01-01 00:00:05"), "A", 2.0)) ++
        (1 to 4).map(i => Ev(ts("2024-01-01 00:00:10"), "A", 8.0))
      val w1 = (1 to 8).map(i => Ev(ts("2024-01-01 00:00:35"), "A", 9.0))
      mem.addData(w0: _*); q.processAllAvailable()
      mem.addData(w1: _*); q.processAllAvailable()
      // advance the watermark so both windows finalize
      mem.addData(Ev(ts("2024-01-01 00:02:00"), "A", 5.0))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("drift").collect()
      .map(r => r.getAs[Timestamp]("window_start").toString ->
        r.getAs[Double]("psi")).toMap
    val balanced = rows("2024-01-01 00:00:00.0")
    val shifted = rows("2024-01-01 00:00:30.0")
    assert(math.abs(balanced) < 0.01, s"balanced window psi $balanced")
    assert(shifted > 1.0, s"shifted window psi $shifted")
  }

  test("streaming vector dedup: near-dups of indexed vectors dropped, " +
      "index grows so later batches see earlier survivors") {
    import java.nio.file.Files
    import graft.ops.SimilarityOps
    import graft.streaming.StreamingVecDedup
    val root = Files.createTempDirectory("graft_svdedup").toString
    val in = s"$root/in"; val out = s"$root/out"
    val idx = s"$root/idx"; val ckpt = s"$root/ckpt"
    val dim = 4; val bits = 2

    def vdf(rows: (Long, Array[Float])*) = rows.toSeq
      .toDF("vec_id", "embedding")
    val vA = Array(1f, 0f, 0f, 0f)
    val vB = Array(0f, 1f, 0f, 0f)
    val vC = Array(0f, 0f, 1f, 0f)
    val vD = Array(0f, 0f, 0f, 1f)
    SimilarityOps.writeIvfIndex(vdf(1L -> vA), idx, dim, bits)
    Files.createDirectories(java.nio.file.Paths.get(in))

    val stream = spark.readStream
      .schema(vdf(0L -> vA).schema).parquet(in)
    val q = StreamingVecDedup.run(spark, stream, idx, out, ckpt,
      dim, bits, minCos = 0.99,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    try {
      // batch 1: a clone of the indexed vector (10, dropped) + fresh (11)
      vdf(10L -> vA, 11L -> vB).write.mode("append").parquet(in)
      q.processAllAvailable()
      // batch 2: a clone of survivor 11 (20, dropped), an in-batch
      // identical pair (21/22 -> 21 survives), a fresh vector (23)
      vdf(20L -> vB, 21L -> vC, 22L -> vC, 23L -> vD)
        .write.mode("append").parquet(in)
      q.processAllAvailable()
    } finally q.stop()

    val kept = spark.read.parquet(out).select("vec_id")
      .collect().map(_.getLong(0)).sorted
    assert(kept === Array(11L, 21L, 23L))
  }

  test("streaming minhash dedup: corpus dups dropped, index grows so " +
      "later batches see earlier survivors") {
    import java.nio.file.{Files, Paths}
    import graft.ops.DedupOps
    import graft.streaming.StreamingDedup
    val root = Files.createTempDirectory("graft_sdedup").toString
    val in = s"$root/in"; val out = s"$root/out"
    val idx = s"$root/idx"; val ckpt = s"$root/ckpt"
    Files.createDirectories(Paths.get(in))

    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again today"),
      (3L, "completely different words nothing in common at all here now"))
      .toDF("doc_id", "text")
    DedupOps.writeMinhashIndex(corpus, idx)

    def writeFile(name: String, docs: Seq[(Long, String)]): Unit =
      Files.write(Paths.get(in, name), docs.map { case (id, t) =>
        s"""{"doc_id": $id, "text": "$t"}"""
      }.mkString("\n").getBytes("UTF-8"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))

    // batch 1: a corpus dup (10), a fresh doc (11)
    writeFile("f1.json", Seq(
      (10L, "the quick brown fox jumps over the lazy dog again today"),
      (11L, "fresh text that matches nothing previously indexed at all")))
    val stream = graft.streaming.StreamingMetrics.fileStream(
      spark, schema, in)
    val q = StreamingDedup.run(spark, stream, idx, out, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    try {
      q.processAllAvailable()
      // batch 2: a dup of batch-1 survivor 11 (20), an in-batch identical
      // pair (21/22 -> min id 21 survives), and a fresh doc (23)
      writeFile("f2.json", Seq(
        (20L, "fresh text that matches nothing previously indexed at all"),
        (21L, "brand new sentence appearing twice within this micro batch"),
        (22L, "brand new sentence appearing twice within this micro batch"),
        (23L, "yet another unrelated document about distributed query engines")))
      q.processAllAvailable()
    } finally q.stop()

    val kept = spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(kept === Array(11L, 21L, 23L))
    // the index now covers corpus + survivors: a probe for 11's text hits
    val probe = Seq((99L,
      "fresh text that matches nothing previously indexed at all"))
      .toDF("doc_id", "text")
    val hits = DedupOps.minhashIndexProbe(spark, idx, probe)
      .select("doc_corpus").collect().map(_.getLong(0))
    assert(hits.contains(11L))
  }

  // The in-loop-compaction soak runs under BOTH state-store providers:
  // the default (HDFS-backed) one and RocksDB — the production
  // combination the streaming index paths ship with. The dedup pipeline
  // itself folds through foreachBatch, but the provider governs every
  // stateful operator the stream composes with, so the soak must hold
  // under each.
  for (provider <- Seq(None, Some(
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")))
  test("streaming minhash dedup with in-loop incremental compaction" +
      provider.fold("")(_ => " under RocksDB state store") +
      ": every batch folds the delta, generations advance, dedup " +
      "semantics unchanged") {
    import java.nio.file.{Files, Paths}
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    provider.foreach(p =>
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", p))
    try {
    import graft.ops.{DedupOps, IndexMaintenance}
    import graft.streaming.StreamingDedup
    val root = Files.createTempDirectory("graft_sdedupc").toString
    val in = s"$root/in"; val out = s"$root/out"
    val idx = s"$root/idx"; val ckpt = s"$root/ckpt"
    Files.createDirectories(Paths.get(in))
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again today"),
      (3L, "completely different words nothing in common at all here now"))
      .toDF("doc_id", "text")
    DedupOps.writeMinhashIndex(corpus, idx)
    val gen0 = IndexMaintenance.currentBase(spark, idx)

    def writeFile(name: String, docs: Seq[(Long, String)]): Unit =
      Files.write(Paths.get(in, name), docs.map { case (id, t) =>
        s"""{"doc_id": $id, "text": "$t"}"""
      }.mkString("\n").getBytes("UTF-8"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))

    writeFile("f1.json", Seq(
      (10L, "the quick brown fox jumps over the lazy dog again today"),
      (11L, "fresh text that matches nothing previously indexed at all")))
    val stream = graft.streaming.StreamingMetrics.fileStream(
      spark, schema, in)
    val q = StreamingDedup.run(spark, stream, idx, out, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L),
      compactEvery = 1)
    try {
      q.processAllAvailable()
      writeFile("f2.json", Seq(
        (20L, "fresh text that matches nothing previously indexed at all"),
        (23L, "yet another unrelated document about distributed query engines")))
      q.processAllAvailable()
    } finally q.stop()

    // dedup semantics identical to the non-compacting run
    val kept = spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(kept === Array(11L, 23L))
    // every batch folded its delta: no L0 left, generations advanced
    assert(!Files.exists(Paths.get(IndexMaintenance.deltaPath(idx))),
      "in-loop compaction must fold each batch's delta")
    assert(IndexMaintenance.currentBase(spark, idx) !== gen0)
    // the folded index answers probes for both corpus and survivors
    def hits(doc: String) = DedupOps.minhashIndexProbe(spark, idx,
        Seq((99L, doc)).toDF("doc_id", "text"))
      .select("doc_corpus").collect().map(_.getLong(0)).toSet
    assert(hits(
      "fresh text that matches nothing previously indexed at all")
      === Set(11L))
    assert(hits(
      "the quick brown fox jumps over the lazy dog again today")
      === Set(1L))
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState first-seen dedup: repeats drop across " +
       "micro-batches, the TTL horizon readmits an id (T8/T9)") {
    implicit val sql = spark.sqlContext
    import graft.streaming.StreamingEventDedup
    import graft.streaming.StreamingEventDedup.{Ev => DEv}
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    val mem = MemoryStream[DEv]
    val out = StreamingEventDedup.firstSeen(mem.toDS(),
      java.time.Duration.ofMillis(5000))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sdedup").start()
    // TimeMode.ProcessingTime schedules TTL-cleanup batches continuously,
    // so processAllAvailable() never returns (op scaladoc) — poll the
    // sink for the expected row count instead
    def awaitRows(n: Int): Array[(String, String)] = {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      var rows = Array.empty[(String, String)]
      while (rows.length < n && System.nanoTime() < deadline) {
        Thread.sleep(100)
        rows = spark.table("sdedup").collect()
          .map(r => (r.getAs[String]("id"), r.getAs[String]("payload")))
      }
      rows
    }
    try {
      // batch 1: A twice (later ts), B once -> earliest A + B survive.
      // t0 bounds the marker's write time from below: A's seen-marker is
      // written when this batch PROCESSES (>= t0), so its TTL expiry is
      // >= t0 + 5 s — the inside-horizon assertions below are only
      // enforced while the wall clock proves the horizon cannot have
      // passed (a CI pause longer than the TTL legitimately re-admits A,
      // which is the op's contract, not a failure).
      val t0 = System.nanoTime()
      def elapsedMs: Long = (System.nanoTime() - t0) / 1000000L
      mem.addData(
        DEv("A", ts("2024-01-01 00:00:02"), "late-copy"),
        DEv("A", ts("2024-01-01 00:00:01"), "first"),
        DEv("B", ts("2024-01-01 00:00:01"), "b1"))
      assert(awaitRows(2).toSet === Set(("A", "first"), ("B", "b1")))
      // inside the TTL horizon: A again -> dropped (give the stream two
      // seconds of cleanup batches to prove no third row appears)
      mem.addData(DEv("A", ts("2024-01-01 00:00:03"), "redelivery"))
      Thread.sleep(2000)
      val afterRedelivery = spark.table("sdedup").count()
      if (elapsedMs < 5000)
        assert(afterRedelivery === 2L,
          s"redelivery ${elapsedMs}ms after batch 1 is inside the 5 s " +
            "TTL horizon and must drop")
      // the dropped redelivery did NOT refresh A's marker (seen path
      // never writes), so the original marker expires on schedule; once
      // it has, a redelivery passes again
      Thread.sleep(math.max(0L, 6500L - elapsedMs))
      mem.addData(DEv("A", ts("2024-01-01 00:00:09"), "after-horizon"))
      // >= 3 rows: SOME post-expiry A redelivery passed. Exactly which
      // ("after-horizon", or "redelivery" if a pause let it through and
      // its marker then suppressed the follow-up) depends on wall-clock
      // scheduling; every surviving row must come from this legal set.
      val all = awaitRows(3)
      assert(all.length >= 3, "an expired marker must re-admit the id")
      assert(all.toSet.subsetOf(Set(("A", "first"), ("B", "b1"),
        ("A", "redelivery"), ("A", "after-horizon"))))
      assert(all.toSet.contains(("A", "first")) &&
        all.toSet.contains(("B", "b1")))
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("anomaly detector warm-starts from batch history via " +
       "transformWithState initial state (lambda handoff)") {
    implicit val sql = spark.sqlContext
    import graft.streaming.StreamingAnomaly
    import graft.streaming.StreamingAnomaly.{Baseline, Obs => AObs}
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    val mem = MemoryStream[AObs]
    val history = Seq(Baseline("k", Seq(10L, 12L, 9L, 11L))).toDS()
    val out = StreamingAnomaly.detectWithHistory(mem.toDS(), history,
      nRows = 4, z = 3.0)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("swarm").start()
    try {
      // the FIRST streamed point is a spike vs the batch baseline:
      // without the initial state it would be an unflagged warm-up row
      mem.addData(AObs("k", ts("2024-01-01 00:00:01"), 100L),
        AObs("newkey", ts("2024-01-01 00:00:01"), 100L))
      q.processAllAvailable()
      val rows = spark.table("swarm").collect()
        .map(r => r.getAs[String]("key") ->
          ((r.getAs[Int]("base_n"), r.getAs[Boolean]("is_anomaly")))).toMap
      assert(rows("k") === ((4, true)), "warm baseline flags the spike")
      assert(rows("newkey") === ((0, false)), "unknown key cold-starts")
      // the streamed spike then joins the rolling window: the next point
      // is judged against a baseline containing it (std huge -> false)
      mem.addData(AObs("k", ts("2024-01-01 00:00:02"), 10L))
      q.processAllAvailable()
      val second = spark.table("swarm").collect()
        .find(r => r.getAs[String]("key") == "k" &&
          r.getAs[Long]("value") == 10L).get
      assert(second.getAs[Boolean]("is_anomaly") === false)
      assert(second.getAs[Int]("base_n") === 4)
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState timers close a session after wall-clock " +
       "silence — no closing event required") {
    implicit val sql = spark.sqlContext
    import graft.streaming.StreamingSessionTimeout
    import graft.streaming.StreamingSessionTimeout.Hit
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    val mem = MemoryStream[Hit]
    val out = StreamingSessionTimeout.sessions(mem.toDS(), gapMs = 2000)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("stimeout").start()
    def awaitRows(n: Int): Array[(String, Long, Double)] = {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      var rows = Array.empty[(String, Long, Double)]
      while (rows.length < n && System.nanoTime() < deadline) {
        Thread.sleep(100)
        rows = spark.table("stimeout").collect()
          .map(r => (r.getAs[String]("key"), r.getAs[Long]("n_events"),
            r.getAs[Double]("total_value")))
      }
      rows
    }
    try {
      // Time-aware strictness: u1's keep-alive (4.0) only extends the
      // session if it lands within the 2 s gap of the opening events. A
      // CI pause can push it past the gap, legally splitting u1 into two
      // sessions — measure the elapsed time and only enforce the strict
      // shape when the clock proves the extension was in time.
      val t0 = System.nanoTime()
      mem.addData(Hit("u1", 1.0), Hit("u1", 2.0), Hit("u2", 10.0))
      Thread.sleep(500)
      // u1 keeps the session alive past the first gap; u2 goes silent
      mem.addData(Hit("u1", 4.0))
      val extendMs = (System.nanoTime() - t0) / 1000000L
      val inTime = extendMs < 1900
      val joined = Set(("u2", 1L, 10.0), ("u1", 3L, 7.0))
      val split = Set(("u2", 1L, 10.0), ("u1", 2L, 3.0), ("u1", 1L, 4.0))
      // u2's summary arrives on its own (timer batch), no further events
      val first = awaitRows(1)
      if (inTime) assert(first.toSet === Set(("u2", 1L, 10.0)))
      // then u1's extended session closes with ALL its events folded in
      val both = awaitRows(2)
      if (inTime) assert(both.toSet === joined)
      else assert(both.toSet.subsetOf(joined union split))
      // a post-close event starts a FRESH session for u1
      mem.addData(Hit("u1", 100.0))
      val fresh = ("u1", 1L, 100.0)
      var all = awaitRows(both.length + 1)
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (!all.toSet.contains(fresh) && System.nanoTime() < deadline)
        all = awaitRows(all.length + 1)
      assert(all.toSet.contains(fresh),
        "a post-close event must open and close a fresh session")
      if (inTime) assert(all.toSet === joined + fresh)
      else assert(all.toSet.subsetOf(joined.union(split) + fresh))
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming packer carries the token offset across micro-batches " +
       "and matches batch packSequences bitwise on any batch split") {
    implicit val sql = spark.sqlContext
    import graft.streaming.StreamingPacker
    val mem = MemoryStream[StreamingPacker.Doc]
    val out = StreamingPacker.pack(mem.toDS(), budget = 128)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("spack").start()
    val rnd = new scala.util.Random(7)
    val docs = (0L until 40L).map(i => StreamingPacker.Doc(
      if (i % 3 == 0) "s" else "t", i,
      if (i % 11 == 0) 0L else 1L + rnd.nextInt(400).toLong))
    try {
      // three uneven splits; a straddling doc's sequence range must span
      // state carried from an earlier batch
      mem.addData(docs.take(7): _*)
      q.processAllAvailable()
      mem.addData(docs.slice(7, 25): _*)
      q.processAllAvailable()
      mem.addData(docs.drop(25): _*)
      q.processAllAvailable()
      val stream = spark.table("spack").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("tok_start"), r.getAs[Long]("start_seq"),
            r.getAs[Long]("end_seq"), r.getAs[Long]("head_offset")))).toMap
      val batch = graft.ops.CorpusOps.packSequences(
          docs.map(d => (d.doc_id, d.group, d.tokens))
            .toDF("doc_id", "source", "tok"),
          "doc_id", "source", col("tok"), budget = 128)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("tok_start"), r.getAs[Long]("start_seq"),
            r.getAs[Long]("end_seq"), r.getAs[Long]("head_offset")))).toMap
      assert(stream === batch)
      assert(stream.nonEmpty && stream.size < docs.size) // zero-tok drops
    } finally q.stop()
  }

  test("streaming packer recovers its token offset from the checkpoint " +
       "across query restarts (no replay, no offset reset)") {
    import java.nio.file.{Files, Paths}
    import graft.streaming.StreamingPacker
    val root = Files.createTempDirectory("graft_pack_ckpt").toString
    val in = s"$root/in"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    Files.createDirectories(Paths.get(in))
    def writeFile(name: String, lines: Seq[String]): Unit =
      Files.write(Paths.get(in, name),
        lines.mkString("\n").getBytes("UTF-8"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("group",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("tokens",
        org.apache.spark.sql.types.LongType)))
    def start() = {
      val docs = spark.readStream.schema(schema).json(in)
        .as[StreamingPacker.Doc](
          org.apache.spark.sql.Encoders.product[StreamingPacker.Doc])
      StreamingPacker.pack(docs, budget = 100)
        .writeStream.outputMode("append").format("parquet")
        .option("path", out).option("checkpointLocation", ckpt).start()
    }
    // lifetime 1: 130 tokens land in group s
    writeFile("f1.json", Seq(
      """{"group": "s", "doc_id": 1, "tokens": 70}""",
      """{"group": "s", "doc_id": 2, "tokens": 60}"""))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // lifetime 2: SAME checkpoint — doc 3 must continue at offset 130
    // (state-store recovery), and docs 1/2 must not replay into the sink
    writeFile("f2.json",
      Seq("""{"group": "s", "doc_id": 3, "tokens": 50}"""))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val rows = spark.read.parquet(out).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("tok_start"), r.getAs[Long]("start_seq"),
          r.getAs[Long]("end_seq")))).toMap
    assert(rows.size === 3)
    assert(rows(1L) === ((0L, 0L, 0L)))
    assert(rows(2L) === ((70L, 0L, 1L)))
    assert(rows(3L) === ((130L, 1L, 1L)))
  }

  test("streaming z-score anomaly carries the rolling baseline across " +
       "micro-batches and matches the batch window op bitwise") {
    implicit val sql = spark.sqlContext
    import graft.streaming.StreamingAnomaly
    val mem = MemoryStream[StreamingAnomaly.Obs]
    val out = StreamingAnomaly.detect(mem.toDS(), nRows = 4, z = 3.0)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sanom").start()
    val values = Seq(1000L, 1200L, 900L, 1100L, 10000L, 1000L, 1050L)
    val obs = values.zipWithIndex.map { case (v, i) =>
      StreamingAnomaly.Obs("btc", ts(s"2024-01-01 00:0$i:00"), v)
    }
    try {
      // split right before the spike: its baseline lives in prior batches
      mem.addData(obs.take(4): _*)
      q.processAllAvailable()
      mem.addData(obs.drop(4): _*)
      q.processAllAvailable()
      val stream = spark.table("sanom").collect()
        .map(r => r.getAs[Timestamp]("ts") ->
          ((Option(r.getAs[java.lang.Double]("zscore")).map(_.toDouble),
            r.getAs[Boolean]("is_anomaly")))).toMap
      assert(stream.size === values.length)
      val batch = graft.ops.TimeSeriesOps.rollingZScoreAnomaly(
          obs.map(o => (o.key, o.ts, o.value)).toDF("k", "t", "v"),
          "k", Seq("t"), "v", nRows = 4, z = 3.0)
        .collect().map(r => r.getAs[Timestamp]("t") ->
          ((Option(r.getAs[java.lang.Double]("zscore")).map(_.toDouble),
            r.getAs[Boolean]("is_anomaly")))).toMap
      // bitwise zscore parity + identical flags on every point,
      // including the spike (flagged) and the post-spike points (not:
      // the spike inflates their baseline std)
      assert(stream === batch)
      assert(stream(obs(4).ts)._2 === true)
      assert(stream(obs(5).ts)._2 === false)
    } finally q.stop()
  }
}

package graft

import java.sql.Timestamp
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.ops._

class CoreOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("unpivot explodes measures and drops nulls (E2)") {
    val df = Seq((1L, 2.0, 3.0), (2L, 4.0, 5.0)).toDF("id", "a", "b")
      .withColumn("c", lit(null).cast("double"))
    val out = RelationalOps.unpivot(df, Seq("id"), Seq("a", "b", "c"))
    assert(out.count() === 4) // nulls dropped
    val row = out.filter($"id" === 1L && $"measure" === "a").collect().head
    assert(row.getAs[Double]("val") === 2.0)
  }

  test("windowed metrics: count/avg/last-by-time per 30s window (A1-A4)") {
    val df = Seq(
      ("A", ts("2024-01-01 00:00:05"), 10.0),
      ("A", ts("2024-01-01 00:00:20"), 30.0),
      ("A", ts("2024-01-01 00:00:40"), 99.0),
      ("B", ts("2024-01-01 00:00:10"), 7.0)
    ).toDF("event_type", "ts", "value")
    val out = MetricOps.windowedMetrics(df, "30 seconds").collect()
    val a0 = out.find(r => r.getAs[String]("event_type") == "A" &&
      r.getAs[Timestamp]("window_start") == ts("2024-01-01 00:00:00")).get
    assert(a0.getAs[Long]("n_events") === 2L)
    assert(a0.getAs[Double]("avg_value") === 20.0)
    assert(a0.getAs[Double]("last_value") === 30.0) // argmax by ts
    val a1 = out.find(r => r.getAs[String]("event_type") == "A" &&
      r.getAs[Timestamp]("window_start") == ts("2024-01-01 00:00:30")).get
    assert(a1.getAs[Double]("last_value") === 99.0)
  }

  test("capped windowed metrics: texts hold the N smallest keys, metrics " +
      "match the uncapped op, a large cap degenerates to uncapped") {
    val df = Seq(
      ("A", ts("2024-01-01 00:00:05"), 10.0, """{"k": 9}"""),
      ("A", ts("2024-01-01 00:00:10"), 20.0, """{"k": 3}"""),
      ("A", ts("2024-01-01 00:00:15"), 30.0, """{"k": 12}"""),
      ("A", ts("2024-01-01 00:00:20"), 40.0, """{"k": 5}"""),
      ("B", ts("2024-01-01 00:00:10"), 7.0, """{"k": 1}""")
    ).toDF("event_type", "ts", "value", "props")
    val capped = MetricOps
      .windowedMetricsWithTextsCapped(df, "30 seconds", maxTexts = 2)
      .collect()
    val a = capped.find(_.getAs[String]("event_type") == "A").get
    // LEXICOGRAPHIC smallest two of ("9","3","12","5") = "12","3"
    assert(a.getAs[String]("props_keys") === "12 3")
    // combining metrics are those of the FULL group, not the kept texts
    assert(a.getAs[Long]("n_events") === 4L)
    assert(a.getAs[Double]("avg_value") === 25.0)
    assert(a.getAs[Double]("last_value") === 40.0)
    assert(capped.find(_.getAs[String]("event_type") == "B").get
      .getAs[String]("props_keys") === "1")
    // cap >= group size reproduces the uncapped op row-for-row
    val un = MetricOps.windowedMetricsWithTexts(df, "30 seconds")
      .collect().map(_.toSeq).toSet
    val wide = MetricOps
      .windowedMetricsWithTextsCapped(df, "30 seconds", maxTexts = 10)
      .collect().map(_.toSeq).toSet
    assert(wide === un)
  }

  test("MinKAgg: keeps duplicates like row_number<=k, skips nulls, " +
      "merges across partitions") {
    import graft.functions.MinKAgg
    val df = Seq(
      ("g", "5"), ("g", "3"), ("g", "3"), ("g", "9"), ("g", null),
      ("g", "1"), ("g", "7"), ("h", "2")
    ).toDF("grp", "v").repartition(6) // force map-side partials + merge
    val out = df.groupBy($"grp")
      .agg(MinKAgg.minK($"v", 3).as("mins"))
      .collect().map(r => r.getAs[String]("grp") ->
        r.getSeq[String](1)).toMap
    // smallest 3 of (5,3,3,9,1,7) WITH the duplicate kept, null skipped
    assert(out("g") === Seq("1", "3", "3"))
    assert(out("h") === Seq("2"))
  }

  test("MinKAgg rejects an unsupported column type at analysis time " +
      "(string and bigint are the only accepted children)") {
    import graft.functions.MinKAgg
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1.0, 2.0).toDF("v").agg(MinKAgg.minK($"v", 3)).collect()
    }
    assert(e.getMessage.contains("min_k"))
  }

  test("MinKAgg on a bigint column: signed ordinal order (no string " +
      "detour), duplicates kept, nulls skipped, merges across partitions") {
    import graft.functions.MinKAgg
    val df = Seq(
      ("g", Some(5L)), ("g", Some(-3L)), ("g", Some(-3L)),
      ("g", Some(Long.MinValue)), ("g", None), ("g", Some(12L)),
      ("g", Some(0L)), ("h", Some(7L))
    ).toDF("grp", "v").repartition(6) // force map-side partials + merge
    val out = df.groupBy($"grp")
      .agg(MinKAgg.minK($"v", 3).as("mins"))
      .collect().map(r => r.getAs[String]("grp") ->
        r.getSeq[Long](1)).toMap
    // a lexicographic-on-digits order would rank "-3" below "-9..."
    // and "12" below "5"; the ordinal order is the numeric one, with
    // Long.MinValue smallest and the duplicate kept
    assert(out("g") === Seq(Long.MinValue, -3L, -3L))
    assert(out("h") === Seq(7L))
  }

  test("MinKAgg.minKBy ranks by the bigint key with payload tie-break " +
      "(row_number OVER (ORDER BY key, payload) <= k semantics), skips " +
      "null keys and null payloads, merges across partitions") {
    import graft.functions.MinKAgg
    val df = Seq(
      ("g", Some(30L), "c"), ("g", Some(10L), "z"), ("g", Some(10L), "a"),
      ("g", Some(20L), "m"), ("g", None, "dropped-null-key"),
      ("g", Some(5L), null), ("g", Some(40L), "d"), ("h", Some(1L), "x")
    ).toDF("grp", "k", "v").repartition(6)
    val out = df.groupBy($"grp")
      .agg(MinKAgg.minKBy($"k", $"v", 3).as("head"))
      .collect().map(r => r.getAs[String]("grp") ->
        r.getSeq[String](1)).toMap
    // keys 10,10,20 survive (5 has a null payload, so the smallest KEY
    // does not automatically win); equal keys order by payload bytes
    assert(out("g") === Seq("a", "z", "m"))
    assert(out("h") === Seq("x"))
  }

  test("MinKAgg.minKBy rejects a non-bigint key at analysis time") {
    import graft.functions.MinKAgg
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq((1.0, "a")).toDF("k", "v")
        .agg(MinKAgg.minKBy($"k", $"v", 3)).collect()
    }
    assert(e.getMessage.contains("min_k_by"))
  }

  test("MinKAgg.minKBy STRUCT payload: typed array<struct> head, " +
      "field-wise tie-break, null-payload skip, cross-partition merge") {
    import graft.functions.MinKAgg
    import org.apache.spark.sql.Row
    val df = Seq(
      // key ties at 10 tie-break on the struct's (e, v) fields: the
      // double 1.5 < 9.0 even though "1.5" vs "9.0" would agree here,
      // the e field differing at equal key exercises field order
      ("g", Some(10L), Some((10L, 9.0, "z"))),
      ("g", Some(10L), Some((10L, 1.5, "a"))),
      ("g", Some(30L), Some((30L, 0.0, "c"))),
      ("g", Some(20L), Some((20L, 2.0, "m"))),
      ("g", None, Some((99L, 9.9, "dropped-null-key"))),
      ("g", Some(5L), None), // null payload: smallest key does NOT win
      ("h", Some(1L), Some((1L, 1.0, "x")))
    ).toDF("grp", "k", "p")
      .select($"grp", $"k",
        $"p".getField("_1").as("e"), $"p".getField("_2").as("v"),
        $"p".getField("_3").as("s"))
    // nParts=1 puts ALL admitted entries in ONE partial buffer — the
    // layout that catches payload-bytes aliasing across one serialize
    // pass (the UnsafeProjection buffer-reuse bug); nParts=6 exercises
    // the cross-partition merge path
    for (nParts <- Seq(1, 6)) {
      val out = df.repartition(nParts).groupBy($"grp")
        .agg(MinKAgg.minKBy($"k",
          when($"e".isNotNull, struct($"e", $"v", $"s")), 3).as("head"))
      // the aggregate's declared type is the typed struct array
      assert(out.schema("head").dataType.sql ===
        "ARRAY<STRUCT<e: BIGINT, v: DOUBLE, s: STRING>>")
      val rows = out.collect().map(r => r.getAs[String]("grp") ->
        r.getSeq[Row](1).map(x =>
          (x.getLong(0), x.getDouble(1), x.getString(2)))).toMap
      assert(rows("g") === Seq((10L, 1.5, "a"), (10L, 9.0, "z"),
        (20L, 2.0, "m")), s"nParts=$nParts")
      assert(rows("h") === Seq((1L, 1.0, "x")), s"nParts=$nParts")
    }
  }

  test("MinKAgg.minKBy rejects a struct payload with an unorderable " +
      "field at analysis time") {
    import graft.functions.MinKAgg
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq((1L, Seq("a"))).toDF("k", "arr")
        .agg(MinKAgg.minKBy($"k", struct($"arr"), 3)).collect()
    }
    assert(e.getMessage.contains("no supported order"))
  }

  test("forwardFill carries last non-null within key (W6/A12)") {
    val df = Seq(
      ("A", 1, Some(10.0)), ("A", 2, None), ("A", 3, None),
      ("A", 4, Some(40.0)), ("A", 5, None),
      ("B", 1, None), ("B", 2, Some(5.0))
    ).toDF("k", "t", "v")
    val out = WindowOps.forwardFill(df, "k", Seq("t"), "v", "v_ff")
      .orderBy($"k", $"t").collect()
    val filled = out.map(r => (r.getAs[String]("k"), r.getAs[Int]("t"),
      Option(r.getAs[java.lang.Double]("v_ff")).map(_.doubleValue)))
    assert(filled.toSeq === Seq(
      ("A", 1, Some(10.0)), ("A", 2, Some(10.0)), ("A", 3, Some(10.0)),
      ("A", 4, Some(40.0)), ("A", 5, Some(40.0)),
      ("B", 1, None), ("B", 2, Some(5.0))))
  }

  test("sentiment algebra: score/magnitude/label/signal (X1)") {
    val df = Seq(
      (1L, "fast fast big market"),   // pos=3 neg=0 -> score 1
      (2L, "slow small crash"),       // neg=2 -> score -1
      (3L, "fast slow"),              // balanced -> 0 NEUTRAL sell
      (4L, "nothing relevant"),       // 0/0 -> 0.5/0.5 -> 0 NEUTRAL sell
      (5L, "")                        // empty -> all null
    ).toDF("doc_id", "text")
    val out = TextOps.sentiment(df).orderBy($"doc_id").collect()
    def r(i: Int) = out(i)
    assert(r(0).getAs[Double]("sentiment_score") === 1.0)
    assert(r(0).getAs[String]("sentiment_label") === "POSITIVE")
    assert(r(0).getAs[String]("action_signal") === "buy")
    assert(r(1).getAs[Double]("sentiment_score") === -1.0)
    assert(r(1).getAs[String]("sentiment_label") === "NEGATIVE")
    assert(r(1).getAs[String]("action_signal") === "sell")
    assert(r(2).getAs[Double]("sentiment_score") === 0.0)
    assert(r(2).getAs[String]("sentiment_label") === "NEUTRAL")
    assert(r(2).getAs[String]("action_signal") === "sell")
    assert(r(3).getAs[Double]("sentiment_magnitude") === 1.0)
    assert(r(4).isNullAt(r(4).fieldIndex("sentiment_score")))
    assert(r(4).isNullAt(r(4).fieldIndex("sentiment_label")))
  }

  test("pct_change yields null on zero previous value (W2/P4)") {
    val w = WindowOps.keyedWindow("k", Seq("t"))
    val df = Seq(("A", 1, 0.0), ("A", 2, 5.0), ("A", 3, 10.0))
      .toDF("k", "t", "v")
    val out = df.withColumn("pct", WindowOps.pctChange($"v", w))
      .orderBy($"t").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("pct"))) // no previous
    assert(out(1).isNullAt(out(1).fieldIndex("pct"))) // prev = 0 -> null
    assert(out(2).getAs[Double]("pct") === 1.0)
  }

  test("error metrics apply 1e-8 MAPE clamp (A17)") {
    val df = Seq(("A", 0.0, 1.0), ("A", 2.0, 1.0)).toDF("k", "actual", "pred")
    val out = TimeSeriesOps.errorMetrics(df, "k", "actual", "pred").collect()
    val mape = out.head.getAs[Double]("mape")
    // |0-1|/1e-8 * 100 / 2 + |2-1|/2 * 100 / 2 -> dominated by clamp term
    assert(mape > 1e9)
    assert(out.head.getAs[Double]("mae") === 1.0)
  }

  test("explodePrices unpivots wide record, drops null prices (E1)") {
    val wide = Seq((1000L, Some(3000.0), None: Option[Double]))
      .toDF("timestamp", "ETH", "SOL")
    val out = CryptoPipeline.explodePrices(wide, Seq("ETH", "SOL", "SHIB"))
    val rows = out.collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[String]("symbol") === "ETH")
    assert(rows.head.getAs[Double]("price") === 3000.0)
  }

  test("parseEventTime fallback chain (F1-F5)") {
    val df = Seq(
      ("2025-12-29T15:41:00Z", "x", 0L),
      ("2025-12-29 15:41:00", "x", 0L),
      ("bogus", "Mon Dec 29 15:41:00 +0000 2025", 0L),
      ("bogus", "bogus", 1767022860000L)
    ).toDF("iso", "raw", "ms")
    val out = df.select(CryptoPipeline.parseEventTime($"iso", $"raw", $"ms")
      .as("et")).collect()
    val expected = ts("2025-12-29 15:41:00")
    out.foreach(r => assert(r.getAs[Timestamp]("et") === expected))
  }

  test("windowedCryptoMetrics full-outer keeps single-sided keys (J1/J2)") {
    val tweets = Seq(
      ("1", "to the moon", "ETH", "x", "2024-01-01T00:00:10Z", 0L, 0L))
      .toDF("id", "text", "crypto_key", "created_at_raw", "created_at_iso",
        "timestamp_ms", "timestamp_sec")
    val prices = Seq(
      ("SOL", Some(100.0), Some(1704067205000L))) // 2024-01-01 00:00:05 UTC
      .toDF("symbol", "price", "timestamp")
    val out = CryptoPipeline
      .windowedCryptoMetrics(tweets, prices, "30 seconds").collect()
    assert(out.length === 2)
    val eth = out.find(_.getAs[String]("symbol") == "ETH").get
    assert(eth.getAs[Long]("tweet_volume") === 1L)
    assert(eth.isNullAt(eth.fieldIndex("avg_price")))
    val sol = out.find(_.getAs[String]("symbol") == "SOL").get
    assert(sol.getAs[Long]("tweet_volume") === 0L)
    assert(sol.getAs[Double]("last_price") === 100.0)
  }
}

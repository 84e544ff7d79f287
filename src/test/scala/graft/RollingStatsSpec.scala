package graft


import graft.ops.WindowOps

/** Rolling frame statistics (pandas groupby().rolling(n, min_periods=1)
  * analog): hand-computed values on a tiny fixture, NULL-std on one-row
  * frames, and the one-WindowExec plan contract (every statistic shares
  * the frame spec, so Spark must evaluate all six in a single window
  * operator — one shuffle + one sort, no per-stat re-scan).
  */
class RollingStatsSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    // key a: ordered values 2, 4, 9
    ("a", 1L, 2.0), ("a", 2L, 4.0), ("a", 3L, 9.0),
    // key b: single row -> one-row frame
    ("b", 1L, 7.0)
  ).toDF("k", "seq", "v")

  test("rolling mean/std/min/max match hand-computed frames") {
    val out = WindowOps.rollingStats(fixture, "k", Seq("seq"), "v", 3)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r).toMap

    val a3 = out(("a", 3L)) // frame {2,4,9}
    assert(a3.getAs[Long]("roll_n") === 3L)
    assert(a3.getAs[Double]("roll_sum") === 15.0)
    assert(a3.getAs[Double]("roll_mean") === 5.0)
    assert(a3.getAs[Double]("roll_min") === 2.0)
    assert(a3.getAs[Double]("roll_max") === 9.0)
    // sample std of {2,4,9}: sqrt(((4+16+81) - 225/3) / 2) = sqrt(13)
    assert(math.abs(a3.getAs[Double]("roll_std") - math.sqrt(13.0)) < 1e-12)

    val a2 = out(("a", 2L)) // frame {2,4}
    assert(a2.getAs[Double]("roll_mean") === 3.0)
    assert(math.abs(a2.getAs[Double]("roll_std") - math.sqrt(2.0)) < 1e-12)
  }

  test("one-row frame yields NULL std (not NaN) and n=1") {
    val out = WindowOps.rollingStats(fixture, "k", Seq("seq"), "v", 3)
    val b = out.filter($"k" === "b").collect().head
    assert(b.getAs[Long]("roll_n") === 1L)
    assert(b.isNullAt(b.fieldIndex("roll_std")),
      s"one-row std must be NULL, got ${b.get(b.fieldIndex("roll_std"))}")
    // first row of key a is also a one-row frame
    val a1 = out.filter($"k" === "a" && $"seq" === 1L).collect().head
    assert(a1.isNullAt(a1.fieldIndex("roll_std")))
  }

  test("all six statistics evaluate in a single WindowExec") {
    // string-match the executed plan (AdaptiveSparkPlanExec hides its
    // initial plan from collect() until execution, same idiom as
    // PlanShapeSpec): exactly one Window operator, one Exchange.
    val plan = WindowOps.rollingStats(fixture, "k", Seq("seq"), "v", 5)
      .queryExecution.executedPlan.toString
    def count(needle: String) =
      plan.sliding(needle.length).count(_ == needle)
    assert(count("Window [") === 1,
      s"expected one shared Window operator:\n$plan")
    assert(count("Exchange ") === 1,
      s"expected a single shuffle on the key:\n$plan")
  }

  test("rollingZScoreAnomaly: spike flagged against the PRECEDING frame, " +
       "warm-up and zero-variance rows flag false") {
    // steady 10s with one 100 spike, then back to 10: the spike scores
    // against {10,10,10,10} (std 0 -> zero-variance null, flag false?
    // no: four identical values give std 0, so use a jittered baseline)
    val rows = Seq(
      ("k", 1L, 10L), ("k", 2L, 12L), ("k", 3L, 9L), ("k", 4L, 11L),
      ("k", 5L, 100L), // spike vs mean 10.5, std ~1.29 -> |z| >> 3
      ("k", 6L, 10L)   // scored vs frame incl. the spike: std huge -> ok
    ).toDF("k", "seq", "v")
    val out = graft.ops.TimeSeriesOps
      .rollingZScoreAnomaly(rows, "k", Seq("seq"), "v", nRows = 4, z = 3.0)
      .collect().map(r => r.getAs[Long]("seq") ->
        ((r.getAs[Boolean]("is_anomaly"), r.getAs[Long]("base_n")))).toMap
    assert(out(1L) === ((false, 0L))) // warm-up: empty frame
    assert(out(5L)._1 === true)       // the spike
    assert(out(5L)._2 === 4L)
    // the row after the spike is NOT flagged: the spike inflates the
    // baseline std it is scored against (that's why the frame excludes
    // the current row, not why it should include it)
    assert(out(6L)._1 === false)

    // zero-variance baseline: constant frame -> std 0 -> flag false even
    // for a wild value (score undefined, not infinite)
    val flat = Seq(("k", 1L, 5L), ("k", 2L, 5L), ("k", 3L, 5L),
      ("k", 4L, 500L)).toDF("k", "seq", "v")
    val f = graft.ops.TimeSeriesOps
      .rollingZScoreAnomaly(flat, "k", Seq("seq"), "v", nRows = 3, z = 3.0)
      .collect().map(r => r.getAs[Long]("seq") ->
        r.getAs[Boolean]("is_anomaly")).toMap
    assert(f(4L) === false)
  }

  test("rollingZScoreAnomalyChunked is row-identical to the plain form " +
      "across chunk boundaries, sparse time-chunks, and multiple keys") {
    val rnd = new scala.util.Random(17)
    // 3 keys x 400 rows; timestamps stride 100s with gaps (every 7th
    // jumps an hour) so time-chunks of 600s are uneven and some are
    // empty; values jittered with occasional spikes
    val rows = (for {
      k <- Seq("a", "b", "c")
      i <- 0 until 400
    } yield {
      val gap = if (i % 7 == 0) 3600L else 0L
      val ts = new java.sql.Timestamp(
        1704067200000L + (i * 100L + gap + rnd.nextInt(30)) * 1000L)
      val v = if (i % 53 == 0) 5000L else 100L + rnd.nextInt(20)
      (k, ts, i.toLong, v)
    }).toDF("k", "ts", "event_id", "v")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(2)) ->
        (r.getAs[Long]("value"), r.getAs[Long]("base_n"),
          r.getAs[Any]("base_mean"), r.getAs[Any]("base_std"),
          r.getAs[Any]("zscore"), r.getAs[Boolean]("is_anomaly"))).toMap
    val plain = canon(graft.ops.TimeSeriesOps.rollingZScoreAnomaly(
      rows, "k", Seq("ts", "event_id"), "v", nRows = 24, z = 3.0))
    // chunkRows=100 forces multiple chunk boundaries per key (400 rows
    // -> 4 chunks); spanSeconds=600 makes ~40+ time-chunks with gaps
    val chunked = canon(graft.ops.TimeSeriesOps.rollingZScoreAnomalyChunked(
      rows, "k", Seq("ts", "event_id"), "v", nRows = 24, z = 3.0,
      tsCol = "ts", chunkRows = 100, spanSeconds = 600L))
    assert(plain.size === 1200 && chunked.size === 1200)
    assert(plain === chunked)
  }

  test("rollingZScoreAnomalyChunked keeps null-key and null-ts rows " +
      "(they are real window partitions in the plain form)") {
    val rows = (Seq(
      (null.asInstanceOf[String], ts(0L), 900L, 100L),
      (null.asInstanceOf[String], ts(100L), 901L, 110L),
      (null.asInstanceOf[String], ts(200L), 902L, 120L),
      ("k", null.asInstanceOf[java.sql.Timestamp], 903L, 100L),
      ("k", null.asInstanceOf[java.sql.Timestamp], 904L, 105L)) ++
      (0 until 20).map(i => ("k", ts(i * 100L), i.toLong, 100L + i)))
      .toDF("k", "ts", "event_id", "v")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(2)) ->
        (r.getAs[Long]("value"), r.getAs[Long]("base_n"),
          r.getAs[Any]("base_mean"), r.getAs[Any]("base_std"),
          r.getAs[Any]("zscore"), r.getAs[Boolean]("is_anomaly"))).toMap
    val plain = canon(graft.ops.TimeSeriesOps.rollingZScoreAnomaly(
      rows, "k", Seq("ts", "event_id"), "v", nRows = 3, z = 3.0))
    val chunked = canon(graft.ops.TimeSeriesOps.rollingZScoreAnomalyChunked(
      rows, "k", Seq("ts", "event_id"), "v", nRows = 3, z = 3.0,
      tsCol = "ts", chunkRows = 7, spanSeconds = 600L))
    assert(plain.size === 25 && chunked.size === 25)
    assert(plain === chunked)
  }

  test("rollingZScoreAnomalyChunked rejects orderCols not led by tsCol") {
    val df = Seq(("k", ts(0L), 1L, 2L)).toDF("k", "ts", "event_id", "v")
    val e = intercept[IllegalArgumentException] {
      graft.ops.TimeSeriesOps.rollingZScoreAnomalyChunked(
        df, "k", Seq("event_id"), "v", nRows = 3, z = 3.0, tsCol = "ts")
    }
    assert(e.getMessage.contains("lead with tsCol"))
  }

  private def ts(offsetSec: Long): java.sql.Timestamp =
    new java.sql.Timestamp(1704067200000L + offsetSec * 1000L)
}

package graft

import org.apache.spark.sql.functions._
import graft.ops.{MetricOps, SkewOps}

/** Skewed-key join stress (VERDICT r4 item 6): one hot symbol is the
  * realistic crypto shape — a single event_type carrying >=100x the rows
  * of every other key. Two mitigation paths are pinned:
  *
  *  - AQE's OptimizeSkewedJoin splits oversized sort-merge partitions at
  *    runtime for inner/one-sided-outer joins (the metrics-enrich leg).
  *    The spec drops the skew thresholds to toy-data scale, executes, and
  *    asserts the final adaptive plan actually took the skew path —
  *    AND that results match the unsplit join bit-for-bit.
  *  - FULL OUTER joins (J2) cannot be skew-split by AQE (neither side is
  *    safely splittable), which is exactly why SkewOps.saltedJoin exists:
  *    the spec pins salted parity on a 100:1 key and that the salt
  *    actually spreads the hot key `factor` ways.
  */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  // one hot key with 100x the rows of each of 10 cold keys (100:1 ratio)
  private def skewedEvents(hotRows: Int) = {
    val hot = (0 until hotRows).map(i =>
      ("HOT", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        (i % 97).toDouble, i.toLong))
    val cold = (0 until 10).flatMap(k => (0 until hotRows / 100).map(i =>
      (s"C$k", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        i.toDouble, (1000000L + k * 1000 + i))))
    (hot ++ cold).toDF("event_type", "ts", "value", "event_id")
  }

  test("AQE splits the skewed partition of an inner metrics join " +
       "and results are unchanged") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.forceOptimizeSkewedJoin",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      // toy-data-scale thresholds so a few-MB hot partition counts as skew;
      // broadcast off so the join is a splittable sort-merge join
      conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "32KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

      // pad with md5 (incompressible): shuffle map sizes are COMPRESSED
      // bytes, a constant pad would deflate below the skew threshold
      val fact = skewedEvents(hotRows = 60000)
        .withColumn("pad", md5(col("event_id").cast("string")))
      val dim = (Seq("HOT") ++ (0 until 10).map(s => s"C$s"))
        .zipWithIndex.toDF("event_type", "type_id")
      // NOTE no aggregation downstream of the join: a groupBy on the join
      // key would REQUIRE the join's hash partitioning, and AQE refuses a
      // skew split that forces an extra shuffle (that case is what
      // forceOptimizeSkewedJoin / the salted path below are for)
      def agg(rows: Array[(String, Int, Double)]) =
        rows.groupBy(r => (r._1, r._2)).view
          .mapValues(v => (v.length, math.round(v.map(_._3).sum * 100)))
          .toMap
      val joined = fact.join(dim, Seq("event_type"))
        .select(col("event_type"), col("type_id"), col("value"))
      val rows = agg(joined.collect().map(r =>
        (r.getString(0), r.getInt(1), r.getDouble(2))))
      // the FINAL adaptive plan (post-execution) must show the skew path
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("AQEShuffleRead skewed") &&
          plan.contains("skew=true"),
        s"expected an AQEShuffleRead skew split in:\n$plan")

      conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      try {
        val plain = agg(fact.join(dim, Seq("event_type"))
          .select(col("event_type"), col("type_id"), col("value"))
          .collect().map(r => (r.getString(0), r.getInt(1),
            r.getDouble(2))))
        assert(rows === plain)
      } finally conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("salted join spreads a 100:1 hot key and matches the plain join " +
       "(J2 full-outer territory, where AQE cannot split)") {
    val events = skewedEvents(hotRows = 5000)
    val metrics = MetricOps.windowedMetrics(events, "30 seconds")
    val dim = (Seq("HOT") ++ (0 until 10).map(s => s"C$s"))
      .zipWithIndex.toDF("event_type", "type_id")

    val factor = 8
    val salted = SkewOps.saltedJoin(events, dim, "event_type", factor,
        saltSource = Seq("event_id"))
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"),
        max(col("type_id")).as("tid"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
      .sortBy(_._1)
    val plain = events.join(dim, Seq("event_type"))
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"),
        max(col("type_id")).as("tid"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
      .sortBy(_._1)
    assert(salted.toSeq === plain.toSeq)

    // the hot key's rows actually land on all `factor` sub-keys
    val saltSpread = events.filter(col("event_type") === "HOT")
      .select(SkewOps.salt(factor, col("event_id")).as("s"))
      .distinct().count()
    assert(saltSpread === factor.toLong,
      s"hot key spread over $saltSpread/$factor salts")

    // and the windowed-metrics J2 composition stays correct over the
    // skewed input (full-outer: every key from either leg surfaces)
    val enriched = MetricOps.fullOuterMetricsJoin(
      metrics, metrics.withColumnRenamed("n_events", "n2")
        .select(col("window_start"), col("event_type"), col("n2")),
      Seq("window_start", "event_type"))
    assert(enriched.count() === metrics.count())
  }
}

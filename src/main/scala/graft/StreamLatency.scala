package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingMetrics

/** Steady-state micro-batch latency for the speed layer at the
  * reference's 30 s publish cadence. [[StreamBench]] measures THROUGHPUT
  * (AvailableNow drain of a staged file set); this measures the
  * per-batch processing time a 30 s-trigger deployment observes under a
  * SUSTAINED input rate — the number that says whether the pipeline
  * keeps up (p95 batch duration well under the trigger interval = idle
  * headroom; approaching it = backlog forming).
  *
  * Protocol: the `rate` source emits rows at `rowsPerSecond`, shaped
  * deterministically into the events schema (ts/event_type/user_id/
  * value); [[StreamingMetrics.cogroupedMetricsSink]] — the J1 windowed
  * cogroup, the reference's flagship streaming assembly — drains to the
  * noop sink under `Trigger.ProcessingTime(triggerSec)`. Batch
  * durations come from `StreamingQueryProgress.durationMs
  * ("triggerExecution")`; the first `skip` non-empty batches are warmup
  * (state-store init + codegen) and are excluded.
  *
  * Run: `runMain graft.StreamLatency [rateA,rateB,...] [triggerSec]
  * [batches]` (defaults: 50000,500000 rows/s, 30 s, 6 measured batches
  * after 2 warmup). Writes one JSON line to stdout and, best-effort, to
  * SPARK_GRAFT_STREAM_LAT_OUT (default bench/STREAM_LATENCY.json).
  */
object StreamLatency {
  def main(args: Array[String]): Unit = {
    val rates = args.lift(0).getOrElse("50000,500000")
      .split(",").map(_.trim.toLong).toSeq
    val triggerSec = args.lift(1).getOrElse("30").toInt
    val batches = args.lift(2).getOrElse("6").toInt
    val skip = 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = Files.createTempDirectory("graft_streamlat").toString

    // rate rows -> events shape, pure deterministic column algebra
    def source(rate: Long): DataFrame =
      spark.readStream.format("rate")
        .option("rowsPerSecond", rate.toString)
        .load()
        .select(
          col("timestamp").as("ts"),
          element_at(
            array(lit("click"), lit("view"), lit("purchase")),
            (pmod(col("value"), lit(3)) + 1).cast("int")).as("event_type"),
          pmod(col("value"), lit(10000L)).as("user_id"),
          (pmod(col("value"), lit(997L)).cast("double") / 10.0).as("value"))

    def measure(rate: Long): String = {
      val q = StreamingMetrics.cogroupedMetricsSink(
          source(rate), Seq("click", "view"), Seq("purchase"),
          "30 seconds", "30 seconds") { (df, _) =>
          df.write.format("noop").mode("overwrite").save()
        }
        .option("checkpointLocation", s"$root/ckpt_$rate")
        .trigger(Trigger.ProcessingTime(s"$triggerSec seconds"))
        .start()
      def nonEmpty = q.recentProgress.filter(_.numInputRows > 0)
      try {
        while (nonEmpty.length < skip + batches) Thread.sleep(500)
      } finally q.stop()
      val measured = nonEmpty.slice(skip, skip + batches)
      val durs = measured
        .map(_.durationMs.get("triggerExecution").toDouble).sorted
      def pct(p: Double): Double =
        durs(math.min(durs.length - 1, (p * durs.length).toInt))
      val meanRows =
        measured.map(_.numInputRows).sum / measured.length
      System.err.println(f"[streamlat] rate=$rate%d p50=${pct(0.50)}%.0f " +
        f"p95=${pct(0.95)}%.0f max=${durs.last}%.0f ms " +
        f"rows/batch=$meanRows%d")
      s"""{"rows_per_sec":$rate,"batches":$batches,""" +
        f""""p50_ms":${pct(0.50)}%.0f,"p95_ms":${pct(0.95)}%.0f,""" +
        f""""max_ms":${durs.last}%.0f,"mean_rows_per_batch":$meanRows%d}"""
    }

    // per-rate warmup is the `skip` window above (state-store init +
    // first-ever codegen land in the excluded batches)
    val results = rates.map(measure)
    val line = s"""{"metric":"stream_batch_latency","unit":"ms",""" +
      s""""cpus":$cpus,"trigger_sec":$triggerSec,""" +
      s""""results":[${results.mkString(",")}]}"""
    println(line)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_STREAM_LAT_OUT",
      "bench/STREAM_LATENCY.json")
    if (outPath.nonEmpty) {
      try {
        Files.write(Paths.get(outPath), (line + "\n").getBytes("UTF-8"))
        System.err.println(s"[streamlat] written to $outPath")
      } catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[streamlat] could not write $outPath: $e")
      }
    }
    spark.stop()
  }
}

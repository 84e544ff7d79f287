package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingMetrics

/** Speed-layer throughput bench: drives the two headline streaming
  * assemblies ([[graft.streaming.StreamingMetrics.cogroupedMetricsSink]]
  * — the J1 windowed cogroup — and
  * [[graft.streaming.StreamingMetrics.dedupStream]] — watermark-bounded
  * exact dedup) end-to-end through the file source at two input sizes and
  * reports rows/s. The batch catalog has Bench; this is the streaming
  * counterpart the SCALE.md §Streaming numbers come from.
  *
  * Protocol: events for each SF dir are staged once as an 8-file parquet
  * directory; each run streams it through `maxFilesPerTrigger=2` (4
  * micro-batches — a real incremental drain, not one monolithic batch)
  * under Trigger.AvailableNow with a fresh checkpoint, timed from
  * `start()` to termination. Rows/s = input rows / wall seconds. A full
  * warmup pass at the smallest SF runs first so measured numbers are
  * steady-state (JIT + codegen paid), and each component is measured
  * `passes` times (min wins — same integrity rule as Bench: GC pauses
  * inflate, never deflate).
  *
  * Run via `runMain graft.StreamBench [sfDirA] [sfDirB]` (defaults
  * sf0.01 + sf0.1; pass /tmp/sf1 as B for the 1M-row point). Writes one
  * JSON line to stdout and, best-effort, to SPARK_GRAFT_STREAM_OUT
  * (default bench/STREAM_BENCH.json).
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val dirA = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val dirB = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val warmDir = "/root/testdata/sf0.001"
    // toInt up front: a non-numeric env value must fail here, not get
    // spliced into the JSON artifact (or the master URL) as-is
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val passes = sys.env.getOrElse("SPARK_GRAFT_STREAM_PASSES", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = Files.createTempDirectory("graft_streambench").toString

    // stage one SF dir's events as an (up to) 8-file parquet input
    // directory; returns (path, rowCount, dataFileCount). The file count
    // is COUNTED, not assumed: tiny inputs can emit fewer than 8 files
    // (empty partitions write nothing), and it determines the number of
    // micro-batches per drain under maxFilesPerTrigger.
    def stage(sfDir: String, tag: String): (String, Long, Int) = {
      val in = s"$root/in_$tag"
      Tables.events(spark, sfDir)
        .select(col("ts"), col("event_type"), col("user_id"), col("value"))
        .repartition(8)
        .write.mode("overwrite").parquet(in)
      val listing = Files.list(Paths.get(in))
      val files =
        try listing.filter(p =>
          p.getFileName.toString.startsWith("part-")).count().toInt
        finally listing.close()
      (in, spark.read.parquet(in).count(), files)
    }

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType)))

    def source(in: String): DataFrame =
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(in)

    var ckptN = 0
    def freshCkpt(): String = { ckptN += 1; s"$root/ckpt_$ckptN" }

    // one timed end-to-end drain; returns wall seconds
    def timed(startQuery: () => org.apache.spark.sql.streaming
        .StreamingQuery): Double = {
      val t0 = System.nanoTime()
      val q = startQuery()
      try q.awaitTermination() finally q.stop()
      (System.nanoTime() - t0) / 1e9
    }

    // J1 cogroup: windowed per-(window,user) counts of the click/view legs
    // full-outer joined against the purchase leg, written to noop (full
    // evaluation, no sink I/O in the measurement)
    def runCogrouped(in: String): Double = timed { () =>
      StreamingMetrics.cogroupedMetricsSink(
          source(in), Seq("click", "view"), Seq("purchase"),
          "30 seconds", "30 seconds") { (df, _) =>
          df.write.format("noop").mode("overwrite").save()
        }
        .option("checkpointLocation", freshCkpt())
        .trigger(Trigger.AvailableNow())
        .start()
    }

    // watermark-bounded exact dedup on content hash, drained to noop
    def runDedup(in: String): Double = timed { () =>
      StreamingMetrics.dedupStream(source(in), "ts", "30 seconds",
          Seq("event_type", "user_id", "value"))
        .writeStream.format("noop")
        .option("checkpointLocation", freshCkpt())
        .trigger(Trigger.AvailableNow())
        .start()
    }

    val components: Seq[(String, String => Double)] = Seq(
      "cogrouped_metrics" -> runCogrouped _,
      "dedup_stream" -> runDedup _)

    // warmup: full drain of both components at the smallest SF
    val (warmIn, _, _) = stage(warmDir, "warm")
    components.foreach { case (_, run) => run(warmIn) }

    val sized = Seq("a" -> dirA, "b" -> dirB).map { case (tag, d) =>
      stage(d, tag) match { case (in, n, files) => (d, in, n, files) }
    }
    val results = for {
      (sfDir, in, n, files) <- sized
      (name, run) <- components
    } yield {
      // maxFilesPerTrigger=2 on the source: AvailableNow drains in
      // ceil(files/2) micro-batches — derived from the counted staging
      // output, not assumed
      val batches = (files + 1) / 2
      val sec = (1 to passes).map { _ => run(in) }.min
      val rps = n / sec
      System.err.println(
        f"[streambench] $name $sfDir rows=$n sec=$sec%.2f rows/s=$rps%.0f")
      s"""{"component":"$name","sf_dir":"$sfDir","rows":$n,""" +
        s""""files":$files,"micro_batches":$batches,""" +
        f""""sec":$sec%.3f,"rows_per_sec":$rps%.0f}"""
    }
    val line = s"""{"metric":"stream_throughput","unit":"rows_per_sec",""" +
      s""""cpus":$cpus,"passes":$passes,""" +
      s""""results":[${results.mkString(",")}]}"""
    println(line)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_STREAM_OUT",
      "bench/STREAM_BENCH.json")
    if (outPath.nonEmpty) {
      try {
        Files.write(Paths.get(outPath), (line + "\n").getBytes("UTF-8"))
        System.err.println(s"[streambench] written to $outPath")
      } catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[streambench] could not write $outPath: $e")
      }
    }
    spark.stop()
  }
}

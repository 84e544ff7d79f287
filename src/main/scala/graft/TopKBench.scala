package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.TopKOps

/** Micro-benchmark for the TopKPerGroup plan node vs the window
  * row_number spelling, on synthetic data large enough that the sort
  * matters (default 50M rows). Prints one JSON line with both timings.
  * The interesting case for the custom node is few groups / huge rows —
  * the window spelling sorts every row inside each group's partition;
  * the heap keeps k per group per map partition.
  *
  *   set run / envVars := Map("SPARK_GRAFT_CPUS" -> "32")
  *   runMain graft.TopKBench [rows] [groups] [k]
  */
object TopKBench {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(50000000L)
    val groups = args.lift(1).map(_.toInt).getOrElse(100)
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Knuth-hash the id so values are unordered within each group
    def data = spark.range(rows).select(
      (col("id") % groups).cast("string").as("grp"),
      ((col("id") * 2654435761L) % 1000000007L).cast("double").as("value"),
      col("id"))

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def run(label: String, f: => org.apache.spark.sql.DataFrame): Double = {
      f.write.format("noop").mode("overwrite").save() // warm
      val t = time(f.write.format("noop").mode("overwrite").save())
      t
    }
    val heap = run("heap",
      TopKOps.topKPerGroup(data, Seq("grp"), "value", true, "id", k))
    val window = run("window",
      TopKOps.windowTopK(data, Seq("grp"), "value", true, "id", k))
    println(s"""{"bench":"topk","rows":$rows,"groups":$groups,"k":$k,""" +
      s""""heap_sec":$heap,"window_sec":$window}""")
    spark.stop()
  }
}

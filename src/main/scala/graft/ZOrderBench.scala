package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.LayoutOps

/** Micro-benchmark for the native InterleaveBits kernel vs the
  * compositional per-bit column formula (4 ops × bits expression nodes),
  * on synthetic data (default 50M rows, 16 bits/side). The z-key is
  * computed once per row when re-clustering a lake, so the per-row cost
  * of the kernel is the whole cost of the op. Prints one JSON line.
  *
  *   set run / envVars := Map("SPARK_GRAFT_CPUS" -> "32")
  *   runMain graft.ZOrderBench [rows] [bits]
  */
object ZOrderBench {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(50000000L)
    val bits = args.lift(1).map(_.toInt).getOrElse(16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val mask = (1L << bits) - 1
    def df = spark.range(rows).select(
      (col("id") * 7919 % (mask + 1)).as("x"),
      (col("id") * 104729 % (mask + 1)).as("y"))

    // per-bit compositional spelling: ((x >> i) & 1) << 2i | y-side
    def slowKey(x: Column, y: Column): Column =
      (0 until bits).map { i =>
        shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
          .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)),
            2 * i + 1))
      }.reduce(_.bitwiseOR(_))

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def run(c: Column): Double = time {
      df.select(c.as("z")).write.format("noop").mode("overwrite").save()
    }
    // warmup both codepaths, then min of 2 measured passes each
    run(LayoutOps.zorderKey(col("x"), col("y"), bits)); run(slowKey(col("x"), col("y")))
    val native = (1 to 2).map(_ =>
      run(LayoutOps.zorderKey(col("x"), col("y"), bits))).min
    val slow = (1 to 2).map(_ =>
      run(slowKey(col("x"), col("y")))).min
    println(s"""{"rows":$rows,"bits":$bits,"native_sec":$native,""" +
      s""""per_bit_formula_sec":$slow,"speedup":${slow / native}}""")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.functions.InterleaveBits
import graft.ops.LayoutOps

/** Morton key correctness + the layout property z-ordering exists for:
  * per-file min/max ranges stay narrow on BOTH clustered dimensions.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Per-bit reference formula (what the oracle SQL replays). */
  private def slowInterleave(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("magic-number spread matches the per-bit formula") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 2000) {
      val x = rnd.nextLong() & 0x7FFFFFFFL
      val y = rnd.nextLong() & 0x7FFFFFFFL
      assert(InterleaveBits.interleave(x & 1023, y & 1023) ===
        slowInterleave(x & 1023, y & 1023, 10))
      assert(InterleaveBits.interleave(x, y) ===
        slowInterleave(x, y, 31))
    }
  }

  test("known values and masking") {
    assert(InterleaveBits.interleave(3, 0) === 5L)   // 0b0101
    assert(InterleaveBits.interleave(0, 3) === 10L)  // 0b1010
    assert(InterleaveBits.interleave(3, 3) === 15L)  // 0b1111
    // expression masks to `bits` low bits: 1024 wraps to 0 at bits=10
    val out = Seq((1024L, 1L)).toDF("x", "y")
      .select(LayoutOps.zorderKey($"x", $"y", 10).as("z")).head.getLong(0)
    assert(out === 2L)
  }

  test("codegen'd column expression matches the reference on a table") {
    val df = spark.range(5000).select(
      (col("id") * 7919 % 1024).as("x"), (col("id") * 104729 % 1024).as("y"))
    val got = df.select(col("x"), col("y"),
      LayoutOps.zorderKey(col("x"), col("y"), 10).as("z")).collect()
    got.foreach { r =>
      assert(r.getLong(2) === slowInterleave(r.getLong(0), r.getLong(1), 10))
    }
  }

  test("null propagates") {
    val r = Seq((Some(1L), Option.empty[Long]), (Some(2L), Some(3L)))
      .toDF("x", "y")
      .select(LayoutOps.zorderKey($"x", $"y", 4).as("z")).collect()
    assert(r(0).isNullAt(0) && !r(1).isNullAt(0))
  }

  test("z-order clustering keeps BOTH dimensions narrow per file") {
    // uniform 256x256 grid; cluster into 16 slices. Sorting by x alone
    // would give each file the FULL y range; z-order gives each slice a
    // compact tile, so the mean per-file y-span must be far below the
    // global span (and x likewise).
    val n = 1 << 16
    val df = spark.range(n).select(
      (col("id") % 256).as("x"), expr("id div 256").as("y"))
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    LayoutOps.writeZOrdered(df, col("x"), col("y"), 8, 16, dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath)
    assert(files.length === 16)
    val spans = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("x"), max("x"), min("y"), max("y")).head
      (r.getLong(1) - r.getLong(0), r.getLong(3) - r.getLong(2))
    }
    val meanX = spans.map(_._1).sum.toDouble / spans.length
    val meanY = spans.map(_._2).sum.toDouble / spans.length
    // 16 slices of a 256x256 z-curve ≈ 4x4 tile grid: spans ~64 each.
    // Give slack for range-sampling skew; the point is << 255.
    assert(meanX < 140, s"mean x-span $meanX not narrow")
    assert(meanY < 140, s"mean y-span $meanY not narrow")
  }

  test("fileStats produces the file-skipping manifest: one row per " +
       "file, exact counts, spans that quantify clustering") {
    val n = 1 << 14
    val df = spark.range(n).select(
      (col("id") % 128).as("x"), expr("id div 128").as("y"))
    val zdir = java.nio.file.Files.createTempDirectory("fs_z").toString
    val rdir = java.nio.file.Files.createTempDirectory("fs_r").toString
    LayoutOps.writeZOrdered(df, col("x"), col("y"), 7, 8, zdir)
    df.repartition(8).write.mode("overwrite").parquet(rdir) // no locality
    def stats(dir: String) = LayoutOps.fileStats(spark, dir, Seq("x", "y"))
      .collect().map(r => (r.getAs[String]("file"),
        r.getAs[Long]("n_rows"),
        r.getAs[Long]("max_x") - r.getAs[Long]("min_x")))
    val z = stats(zdir); val r = stats(rdir)
    assert(z.length === 8 && r.length === 8)   // one manifest row per file
    assert(z.map(_._2).sum === n && r.map(_._2).sum === n)
    assert(z.map(_._1).distinct.length === 8)
    // the manifest exposes why z-order skips: per-file x-spans shrink
    // under clustering (8 slices of a 128-wide curve ≈ 64-wide tiles,
    // ~74 with range-sampling slack) while round-robin files span the
    // full 127 range
    val zSpan = z.map(_._3).sum.toDouble / z.length
    val rSpan = r.map(_._3).sum.toDouble / r.length
    assert(zSpan < rSpan * 0.7, s"z=$zSpan vs random=$rSpan")
    assert(rSpan > 120, s"round-robin files should span ~everything")
  }

  test("compactParquet bin-packs small files to the byte target") {
    import spark.implicits._
    val inDir = java.nio.file.Files.createTempDirectory("cin").toString
    val outDir = java.nio.file.Files.createTempDirectory("cout").toString
    (1 to 5000).map(i => (i.toLong, s"row $i")).toDF("id", "s")
      .repartition(64).write.mode("overwrite").parquet(inDir)
    val inFiles = new java.io.File(inDir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(inFiles === 64)
    val n = graft.ops.LayoutOps.compactParquet(spark, inDir,
      outDir + "/c", targetFileBytes = 1L * 1024 * 1024)
    val outFiles = new java.io.File(outDir + "/c").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(n < 8 && outFiles === n,
      s"expected $n compacted files, found $outFiles")
    // data survives byte-for-byte (as a set)
    val a = spark.read.parquet(inDir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val b = spark.read.parquet(outDir + "/c").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a === b && a.size === 5000)
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.ZOrderFunctions

/** Data-layout optimization: multi-dimensional clustering of a parquet
  * lake on a space-filling curve.
  *
  * A lake range-partitioned on one column prunes scans filtered on that
  * column only; z-order clustering spreads locality across TWO filter
  * dimensions, so parquet footer min/max stats (and partition-level
  * pruning) cut row groups for predicates on either — the standard
  * Delta/Iceberg OPTIMIZE ZORDER discipline, here as a plain DataFrame op.
  *
  * At 100 TB this is the difference between "fast queries on the
  * partition column, full scans on everything else" and "bounded reads on
  * both": re-cluster once (one shuffle), every subsequent scan pays less.
  */
object LayoutOps {

  /** Morton key over two bucketized coordinates (see
    * [[graft.functions.InterleaveBits]]). Callers normalize raw values
    * into [0, 2^bits) buckets first — e.g. `pmod(col, lit(1 << bits))`
    * for dense integer keys, or a range-bucketizer for continuous values.
    */
  def zorderKey(x: Column, y: Column, bits: Int): Column =
    ZOrderFunctions.zorder_key(x, y, bits)

  /** Re-cluster `df` on the z-order of (xCol, yCol) into `numFiles`
    * output slices: range-partition by key (equal-frequency slices via
    * sampling) and sort within each, so each output file owns a compact
    * z-range == a compact 2-D tile, and BOTH columns' footer min/max are
    * narrow. The key column is dropped before handing back — it is layout
    * state, not data.
    */
  def zorderCluster(df: DataFrame, xCol: Column, yCol: Column,
                    bits: Int, numFiles: Int): DataFrame = {
    val keyed = df.withColumn("__zkey", zorderKey(xCol, yCol, bits))
    keyed.repartitionByRange(numFiles, col("__zkey"))
      .sortWithinPartitions(col("__zkey"))
      .drop("__zkey")
  }

  /** zorderCluster + parquet write: one file per z-range slice. */
  def writeZOrdered(df: DataFrame, xCol: Column, yCol: Column,
                    bits: Int, numFiles: Int, path: String): Unit =
    zorderCluster(df, xCol, yCol, bits, numFiles)
      .write.mode("overwrite").parquet(path)

  /** Compact a parquet directory's small files into ~targetFileBytes
    * outputs (the OPTIMIZE/bin-packing half of lake maintenance; the
    * clustering half is [[writeZOrdered]]). Streaming sinks and
    * fine-grained ingestion leave thousands of KB-sized files per
    * partition; at 100 TB that turns every scan into an open/seek storm
    * and floods the driver's file index. One round-robin repartition to
    * `ceil(input bytes / target)` fixes it, paying one shuffle of the
    * data being compacted. Returns the chosen output-file count.
    */
  def compactParquet(spark: org.apache.spark.sql.SparkSession,
                     inPath: String, outPath: String,
                     targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    val p = new org.apache.hadoop.fs.Path(inPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // recursive: partitioned datasets keep their files in subdirectories,
    // a top-level listing would see 0 bytes and cram everything into one file
    val it = fs.listFiles(p, true)
    var totalBytes = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.endsWith(".parquet"))
        totalBytes += f.getLen
    }
    require(totalBytes > 0,
      s"compactParquet: no parquet data under $inPath")
    val n = math.max(1, math.ceil(
      totalBytes.toDouble / targetFileBytes).toInt)
    spark.read.parquet(inPath).repartition(n)
      .write.mode("overwrite").parquet(outPath)
    n
  }

  /** Per-file manifest statistics over a parquet dataset: row count plus
    * min/max of the named columns per physical file — the file-skipping
    * manifest a lake format maintains, derived here from any parquet
    * directory with one narrow scan (`input_file_name` + groupBy; only
    * the stat columns are read). Run it over [[writeZOrdered]] output to
    * QUANTIFY skipping: narrow per-file spans on both clustered
    * dimensions mean a predicate on either prunes whole files. At 100 TB
    * the scan parallelizes per file and the result is O(files) rows.
    */
  def fileStats(spark: org.apache.spark.sql.SparkSession, path: String,
                statCols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +:
      statCols.flatMap(c =>
        Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    spark.read.parquet(path)
      .select(statCols.map(col) :+ input_file_name().as("_file"): _*)
      .groupBy(col("_file"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("file", regexp_extract(col("_file"), "[^/]+$", 0))
      .drop("_file")
  }
}

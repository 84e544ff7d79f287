package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Maintenance shared by the on-disk bucket-partitioned indexes (the
  * MinHash text index and the sign-LSH IVF vector index).
  *
  * Layout: LSM-shaped, two levels.
  *   - BASE: parquet partitioned by `bucket` — the probe's
  *     partition-pruned scan unit, one file per bucket after compaction.
  *   - DELTA (`<path>_delta`): flat parquet carrying `bucket` as a plain
  *     column — each streaming micro-batch appends ONE file here instead
  *     of fanning one tiny file into every touched bucket directory. At
  *     4096-bucket width a micro-batch touching most buckets would
  *     otherwise pay thousands of file creates + committer renames per
  *     batch (measured locally: the dynamic-partition append costs ~10×
  *     the flat write); the delta write is O(1) files per batch.
  *
  * Probes read base (pruned) plus the delta filtered on the same bucket
  * set (predicate-pushed column filter — no pruning, but the delta is
  * small by construction: it only holds appends since the last
  * compaction, so probe cost stays batch-proportional as long as
  * compaction runs on any sane cadence — the classic L0 contract).
  * Compaction folds delta rows into the bucketed base and clears the
  * delta.
  *
  * SINGLE-WRITER contract: quiesce appenders for the compaction swap.
  * Crash recovery favors NO LOSS over no-duplicates: a crash between the
  * base swap and the delta cleanup leaves the folded rows in both levels;
  * probes may transiently double-count a row (for near-dup candidacy at
  * min-shared=1 this changes nothing — a duplicated row only re-reports
  * an existing match), and the next compaction removes the duplicates via
  * `dedupKeys`. At 100 TB compact bucket directories individually (same
  * two-phase write-then-rename per bucket, same quiesce window) so probes
  * only ever miss the one bucket mid-swap.
  */
object IndexMaintenance {

  /** The L0 append location for a bucketed index at `path`. */
  def deltaPath(path: String): String = path + "_delta"

  private def fs(spark: SparkSession, p: Path): FileSystem =
    // the PATH's filesystem, not defaultFS (index may live off-cluster)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def hasParquet(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    val f = fs(spark, p)
    f.exists(p) && f.listStatus(p).exists(_.getPath.getName.endsWith(".parquet"))
  }

  /** Append rows (carrying a `bucket` column) to the index's delta as a
    * single flat file — the per-micro-batch write path.
    */
  def appendDelta(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("append").parquet(deltaPath(path))

  /** Read the index rows for a set of buckets: the base scan partition-
    * prunes to the named directories; delta rows (if any) ride along
    * through a predicate-pushed filter. Column order follows the base.
    * `partitionCol` names the bucketing column ("bucket" for the hash
    * indexes, "cell" for the IVF-PQ codes).
    */
  def readBucketed(spark: SparkSession, path: String, buckets: Seq[Int],
                   partitionCol: String = "bucket"): DataFrame = {
    val pred = col(partitionCol).isin(buckets.map(Integer.valueOf): _*)
    val base = spark.read.parquet(path).filter(pred)
    val dp = deltaPath(path)
    if (hasParquet(spark, dp))
      base.unionByName(
        spark.read.parquet(dp).filter(pred)
          .select(base.columns.map(col).toIndexedSeq: _*))
    else base
  }

  /** Rewrite a `bucket`-partitioned parquet index to one file per bucket
    * directory, folding any delta rows in, via a sibling temp dir and a
    * delete+rename swap.
    *
    * Crash-safe on retry: a failure between the delete and the rename
    * leaves the compacted index stranded at `_compact_tmp` with nothing
    * at `path`; on the next call that state is detected and the rename
    * is finished before anything else runs, so a crashed compaction
    * self-heals instead of requiring manual recovery. A crash before the
    * delta cleanup re-folds the same delta rows next time; `dedupKeys`
    * (columns that uniquely identify a row, e.g. (doc_id, band)) makes
    * that re-fold collapse the duplicates.
    */
  def compactBucketed(spark: SparkSession, path: String,
                      dedupKeys: Seq[String] = Nil,
                      partitionCol: String = "bucket"): Unit = {
    val tmp = path + "_compact_tmp"
    val dst = new Path(path)
    val src = new Path(tmp)
    val f = fs(spark, dst)
    heal(f, src, dst)
    val dp = deltaPath(path)
    val withDelta = hasParquet(spark, dp)
    val base = spark.read.parquet(path)
    val all = if (withDelta)
      base.unionByName(spark.read.parquet(dp)
        .select(base.columns.map(col).toIndexedSeq: _*))
    else base
    val deduped =
      if (dedupKeys.nonEmpty) all.dropDuplicates(dedupKeys) else all
    deduped.repartition(col(partitionCol))
      .write.mode("overwrite").partitionBy(partitionCol).parquet(tmp)
    f.delete(dst, true)
    // rename reports several failure modes via `false`, not an exception;
    // past the delete a silent false would strand the index — fail loudly
    require(f.rename(src, dst),
      s"compactBucketed: rename $tmp -> $path failed after the old " +
        "index was deleted; the compacted index remains at the temp path")
    if (withDelta) f.delete(new Path(dp), true)
  }

  /** Finish an interrupted swap: if the destination is gone but the
    * compacted temp dir survived, promote the temp dir. A stale temp dir
    * NEXT TO a live destination (crash before the delete) needs no action
    * here — the next compaction's overwrite-mode write replaces it.
    */
  private def heal(f: FileSystem, src: Path, dst: Path): Unit =
    if (!f.exists(dst) && f.exists(src)) {
      require(f.rename(src, dst),
        s"compactBucketed: recovery rename $src -> $dst failed")
    }
}

package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Maintenance shared by the on-disk bucket-partitioned indexes (the
  * MinHash text index and the sign-LSH IVF vector index): incremental
  * appends leave one file per touched bucket per batch — LSM-style write
  * amplification — and periodic compaction rewrites each bucket directory
  * to one file, restoring the probe's one-bounded-scan-per-bucket
  * economics.
  *
  * SINGLE-WRITER contract: quiesce appenders for the swap — an append
  * landing between the scan and the delete is silently dropped, and one
  * landing between delete and rename would make the rename nest the temp
  * dir inside the new directory. The swap is also not atomic for
  * concurrent probes; at 100 TB compact bucket directories individually
  * (same two-phase write-then-rename per bucket, same quiesce window) so
  * probes only ever miss the one bucket mid-swap.
  */
object IndexMaintenance {

  /** Rewrite a `bucket`-partitioned parquet index to one file per bucket
    * directory via a sibling temp dir and a delete+rename swap.
    *
    * Crash-safe on retry: a failure between the delete and the rename
    * leaves the compacted index stranded at `_compact_tmp` with nothing
    * at `path`; on the next call (or a probe-side [[heal]]) that state is
    * detected and the rename is finished before anything else runs, so a
    * crashed compaction self-heals instead of requiring manual recovery.
    */
  def compactBucketed(spark: SparkSession, path: String): Unit = {
    val tmp = path + "_compact_tmp"
    val dst = new org.apache.hadoop.fs.Path(path)
    val src = new org.apache.hadoop.fs.Path(tmp)
    // the PATH's filesystem, not defaultFS (index may live off-cluster)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    heal(fs, src, dst)
    spark.read.parquet(path)
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(tmp)
    fs.delete(dst, true)
    // rename reports several failure modes via `false`, not an exception;
    // past the delete a silent false would strand the index — fail loudly
    require(fs.rename(src, dst),
      s"compactBucketed: rename $tmp -> $path failed after the old " +
        "index was deleted; the compacted index remains at the temp path")
  }

  /** Finish an interrupted swap: if the destination is gone but the
    * compacted temp dir survived, promote the temp dir. A stale temp dir
    * NEXT TO a live destination (crash before the delete) needs no action
    * here — the next compaction's overwrite-mode write replaces it.
    */
  private def heal(fs: org.apache.hadoop.fs.FileSystem,
                   src: org.apache.hadoop.fs.Path,
                   dst: org.apache.hadoop.fs.Path): Unit =
    if (!fs.exists(dst) && fs.exists(src)) {
      require(fs.rename(src, dst),
        s"compactBucketed: recovery rename $src -> $dst failed")
    }
}

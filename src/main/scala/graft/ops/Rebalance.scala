package graft.ops

import org.apache.spark.sql.DataFrame

/** CPU-heavy narrow transforms (per-row hashing, regex sweeps, vector math)
  * need enough input partitions to use the whole cluster. A single small
  * parquet file arrives as one partition — fine for a scan, terrible for
  * 36M md5 calls. At real scale (many files / large row groups) the scan
  * already yields >= parallelism partitions and this is a no-op; locally it
  * round-robins the small input once so the heavy map runs on all cores.
  */
object Rebalance {
  def apply(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // toRdd is the plan's InternalRow RDD (cached on the QueryExecution):
    // partition count without the deserializer lineage that `df.rdd`
    // would wrap around every downstream use
    if (df.queryExecution.toRdd.getNumPartitions < target)
      df.repartition(target)
    else df
  }
}

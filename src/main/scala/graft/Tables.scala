package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All engine operators are pure `DataFrame => DataFrame` functions; these
  * helpers are the only place that knows the on-disk layout. At cluster
  * scale the same code reads a partitioned parquet lake — Catalyst handles
  * partition pruning / predicate pushdown from the logical plan.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    normalizeNtz(spark.read.parquet(s"$sfDir/$name.parquet"))

  /** The generated parquet stores time columns as timestamp-without-
    * timezone (isAdjustedToUTC=false), which Spark 4 surfaces as
    * TIMESTAMP_NTZ. Half the datetime function surface (`unix_millis`,
    * `window`, …) is TIMESTAMP-only, so normalize at the loader: under the
    * engine's fixed UTC session the NTZ->TIMESTAMP cast is a pure type
    * relabel (identical wall-clock values, identical oracle results). The
    * cast sits directly on the scan, so pushdown/pruning are unaffected.
    */
  private def normalizeNtz(df: DataFrame): DataFrame = {
    val ntz = df.schema.fields.collect {
      case f if f.dataType == TimestampNTZType => f.name
    }
    ntz.foldLeft(df)((d, c) => d.withColumn(c, col(c).cast(TimestampType)))
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** `events.ts` is nanosecond-precision parquet, which Spark 4 rejects by
    * default (PARQUET_TYPE_ILLEGAL). Read nanos as long and truncate to
    * microseconds with integer division (ns values exceed double's exact
    * range, so a double divide would corrupt them) — the same truncation
    * DuckDB applies casting TIMESTAMP_NS to TIMESTAMP, keeping the oracle
    * comparable.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw
  }
  /** documents/embeddings feed CPU-heavy per-row work (regex sweeps,
    * hashing, vector math); a small single-file parquet arrives as one
    * partition, so rebalance at the loader (no-op at real scale — see
    * [[graft.ops.Rebalance]]).
    */
  def documents(s: SparkSession, d: String): DataFrame =
    graft.ops.Rebalance(table(s, d, "documents"))
  def embeddings(s: SparkSession, d: String): DataFrame =
    graft.ops.Rebalance(table(s, d, "embeddings"))
}

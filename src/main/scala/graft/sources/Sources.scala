package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Batch sources (SURVEY.md §2.1). The engine's storage interface is
  * columnar parquet; JSON/CSV cover the reference's fixture-replay and
  * BQ-export paths. All readers return plain DataFrames — downstream ops
  * are source-agnostic, and Catalyst pushes filters/projections into every
  * one of these scans.
  */
object Sources {

  /** S5: JSON array files (tweet fixtures — lists of objects, multiLine)
    * (twitter/stream_simulator_continuous.py:38-82). */
  def jsonArray(spark: SparkSession, schema: StructType,
                path: String): DataFrame =
    spark.read.schema(schema).option("multiLine", true).json(path)

  /** JSON-lines variant for streaming-shaped fixtures. */
  def jsonLines(spark: SparkSession, schema: StructType,
                path: String): DataFrame =
    spark.read.schema(schema).json(path)

  /** S8: CSV with header (BQ export -> pandas path, Milestone4 cell 5). */
  def csv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", true).option("inferSchema", true).csv(path)

  /** S3/S6/S7 equivalent: columnar scan with pushdown. */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** ORC scan — second columnar interchange format alongside parquet and
    * the Avro archive path. Spark's native vectorized ORC reader gives the
    * same pushdown/pruning contract as parquet (`PushedFilters` +
    * `ReadSchema` reach the scan), so warehouse exports in ORC drop into
    * every downstream operator unchanged. */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** ORC sink (snappy, Spark's default). Splittable stripes — a 100 TB
    * archive re-reads with full parallelism, like the parquet path. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** K2/K3 equivalent: partitioned parquet sink (idempotent overwrite per
    * partition directory = the engine's at-least-once batch write, T8). */
  def writeParquet(df: DataFrame, path: String,
                   partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(path)
  }
}

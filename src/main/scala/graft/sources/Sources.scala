package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, input_file_name}
import org.apache.spark.sql.types.{StringType, StructType}

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

  /** S4 hardening: quarantining JSON-lines read. The reference validates
    * every blob before load — gzip magic-byte sniff plus a parse check —
    * and skips bad blobs with a log line
    * (terraform/scripts/batch_to_mongo.py:60-106). Spark-first twin, two
    * layers:
    *  - file level: `ignoreCorruptFiles` skips containers whose codec
    *    stream is unreadable (bad gzip magic, truncated archive) with an
    *    executor log line instead of failing the job;
    *  - record level: PERMISSIVE parse routes each unparseable record's
    *    raw text to `_corrupt_record` (null there = clean row).
    * `_src_file` carries file provenance for the quarantine report. Split
    * with [[splitQuarantine]]. One scan serves both sides when the caller
    * aggregates good+bad in a single plan (see the s4_quarantine_stats
    * catalog entry).
    */
  def jsonQuarantined(spark: SparkSession, schema: StructType,
                      path: String): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("ignoreCorruptFiles", "true")
      .json(path)
      .withColumn("_src_file", input_file_name())

  /** (clean rows without the bookkeeping columns, quarantined rows with
    * provenance first). The quarantined side keeps the (all-null) data
    * columns so its scan references real data columns — Spark disallows
    * raw JSON scans whose required schema is only the internal corrupt
    * record column.
    */
  def splitQuarantine(parsed: DataFrame): (DataFrame, DataFrame) = {
    val dataCols = parsed.columns.filterNot(
      c => c == "_corrupt_record" || c == "_src_file")
    val good = parsed.filter(col("_corrupt_record").isNull)
      .select(dataCols.map(col).toIndexedSeq: _*)
    val bad = parsed.filter(col("_corrupt_record").isNotNull)
      .select((Seq("_src_file", "_corrupt_record") ++ dataCols)
        .map(col).toIndexedSeq: _*)
    (good, bad)
  }

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

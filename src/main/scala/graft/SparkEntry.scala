package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` carries one named query per implemented operator (SURVEY.md §2
  * + the north-star training-data ops); `oracleSql` carries the DuckDB twin
  * for every SQL-expressible query. The catalog itself lives in
  * [[graft.queries.Catalog]].
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's headline question (stream_join.py:401-428): per
    * 30-second window and key — how many events, average value, last value,
    * which texts.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("a1a4_windowed_metrics")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Catalog.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (driver records a weaker rows-only check for those). */
  def oracleSql: Map[String, String] = graft.queries.Catalog.oracles
}

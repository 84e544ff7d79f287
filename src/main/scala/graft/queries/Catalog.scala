package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named query per implemented operator (SURVEY.md §2), each with an
  * optional DuckDB oracle twin. Column names are aligned between the Spark
  * result and the oracle SQL (the driver's compare sorts columns by name).
  *
  * Precision policy (hash-stable doubles):
  *  - sums of fixed-decimal data      -> round(sum, 2): exact on both engines
  *  - averages                        -> round(sum,2)/count: bit-identical IEEE
  *  - per-row arithmetic / ratios of exact ints -> raw (identical expression
  *    trees produce identical doubles)
  *  - order-sensitive estimates (corr, stddev, percentile, cosine) -> round 4-6
  * Timestamps: only bucket-aligned or truncated values are emitted (events.ts
  * is nanosecond-precision parquet; Spark truncates to micros on read, so the
  * oracle CASTs to microsecond TIMESTAMP before use).
  */
object Catalog {
  type Q = (SparkSession, String) => DataFrame

  /** `probe = true` marks a diagnostic/ground-truth posture — an entry
    * kept to verify or measure a production twin (exact all-pairs truth,
    * output-bound pair lists, plain single-window keying, recall audits)
    * rather than the shape you would run at 100 TB. The catalog doc
    * generator emits this as the `posture` column, so the catalog itself
    * says which rows are scale postures and which are probes.
    *
    * `scaleTwin = Some(name)` marks a reference-semantics posture: the
    * entry reproduces the reference's exact (unbounded) shape and is the
    * correctness anchor for it, but its own scale fit says it dies at
    * 100 TB (e.g. a single-row whole-series assembly) — `name` is the
    * bounded catalog twin to run at scale instead. Surfaced in the
    * posture column as `ref→name`; like probes, these rows are excluded
    * from the family-fallback exponent aggregate (their measured slopes
    * describe a shape the catalog itself says not to ship).
    */
  final case class Entry(q: Q, oracle: Option[String],
                         probe: Boolean = false,
                         scaleTwin: Option[String] = None)

  def all: Map[String, Entry] =
    CoreQueries.defs ++ StatsQueries.defs ++ TextQueries.defs ++
      DedupSimQueries.defs ++ SeriesQueries.defs ++ PipelineQueries.defs ++
      CorpusQueries.defs ++ RelationalExtQueries.defs ++
      RetrievalQueries.defs

  def queries: Map[String, Q] = all.map { case (k, e) => k -> e.q }
  def oracles: Map[String, String] =
    all.collect { case (k, e) if e.oracle.isDefined => k -> e.oracle.get }
}

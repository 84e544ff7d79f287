package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Windowed-metrics operators — the reference's core batch/speed-layer
  * semantics (SURVEY.md §2.5, §2.4, §2.10).
  *
  * Reference behavior being re-expressed (NOT ported):
  *  - 30 s / 30 min tumbling windows keyed by symbol with
  *    count / avg / last-by-time / collect_list metrics
  *    (reference `dataflow/stream_join.py:401-428`,
  *    `terraform/scripts/batch_to_mongo.py:201-238`).
  *  - full-outer join of the two metric legs on (window, symbol)
  *    (reference `terraform/scripts/batch_to_mongo.py:235`).
  *
  * Scale notes: one shuffle per aggregation on (window, key) — partial
  * aggregation (map-side combine) applies to count/sum/max_by; the
  * full-outer join shuffles both sides on the same key so AQE can pick
  * sort-merge vs shuffled-hash. No driver-side collection anywhere.
  */
object MetricOps {

  /** Exact-parity average: `round(sum, 2) / count`.
    *
    * Double `avg` is order-dependent in its last bits, so a hash-based
    * oracle compare would be flaky. For 2-decimal source data the sum is
    * mathematically a multiple of 0.01, so rounding the sum to 2 decimals
    * lands on the same double in any engine; dividing by the exact count
    * is then bit-identical IEEE math on both sides.
    */
  def exactAvg(c: Column, n: Column): Column = round(sum(c), 2) / n

  /** A1-A4 + T2/T3 + F7: tumbling-window metrics per (window, key).
    *
    * Output: window_start, <key>, n_events, sum_value, avg_value,
    * last_value (argmax by time, A3 — `max_by` is the built-in form of the
    * reference's max-of-struct trick at batch_to_mongo.py:219-226),
    * props_keys (sorted space-joined collect_list, A4 — canonicalized
    * because collect_list order is nondeterministic under shuffle).
    */
  def windowedMetrics(events: DataFrame, dur: String, timeCol: String = "ts",
                      keyCol: String = "event_type", valCol: String = "value")
      : DataFrame = {
    val n = count(lit(1))
    events
      .groupBy(window(col(timeCol), dur), col(keyCol))
      .agg(
        n.as("n_events"),
        round(sum(col(valCol)), 2).as("sum_value"),
        exactAvg(col(valCol), n).as("avg_value"),
        max_by(col(valCol), col(timeCol)).as("last_value"))
      .select(col("window.start").as("window_start"), col(keyCol),
        col("n_events"), col("sum_value"), col("avg_value"), col("last_value"))
  }

  /** Flagship: windowed metrics including the collect_list-of-texts column
    * (reference `tweet_texts`, BQ REPEATED column terraform/storage.tf:157-162)
    * carried as a sorted space-joined string for deterministic compare.
    */
  def windowedMetricsWithTexts(events: DataFrame, dur: String): DataFrame = {
    val n = count(lit(1))
    events
      .withColumn("k", get_json_object(col("props"), "$.k"))
      .groupBy(window(col("ts"), dur), col("event_type"))
      .agg(
        n.as("n_events"),
        round(sum(col("value")), 2).as("sum_value"),
        exactAvg(col("value"), n).as("avg_value"),
        max_by(col("value"), col("ts")).as("last_value"),
        concat_ws(" ", array_sort(collect_list(col("k")))).as("props_keys"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"), col("avg_value"),
        col("last_value"), col("props_keys"))
  }

  /** [[windowedMetricsWithTexts]] with a BOUNDED texts column — the
    * 100 TB form of the flagship family's one non-combining aggregate:
    * the uncapped collect_list buffers and ships EVERY text through the
    * shuffle and into one row (the reference stores the full BQ
    * REPEATED column, so the uncapped twin keeps those semantics),
    * while here only the `maxTexts` lexicographically-smallest keys per
    * (window, key) survive — enforced INSIDE the aggregation buffer
    * ([[graft.functions.MinKAgg]]): map-side partials carry at most
    * `maxTexts` values per (group, partition) through the shuffle and
    * buffer state never grows with group size. One scan, one
    * aggregation, alongside the combining metrics — measured at sf10
    * (10M events, ~112 texts/group, cap 5) this one-scan form beats
    * both the uncapped op AND the earlier two-leg TopKPerGroup + join
    * formulation, which paid the events scan and the (window,key)
    * aggregation twice. (`slice(array_sort(collect_list), 1, N)` would
    * bound only the OUTPUT row — the buffers and shuffle would still
    * carry every text; the per-group top-k PLAN NODE remains the right
    * tool when top-k rows are the QUERY RESULT — o2_topk_per_group —
    * rather than one aggregate among several.)
    */
  def windowedMetricsWithTextsCapped(events: DataFrame, dur: String,
                                     maxTexts: Int): DataFrame = {
    val n = count(lit(1))
    events
      .withColumn("k", get_json_object(col("props"), "$.k"))
      .groupBy(window(col("ts"), dur), col("event_type"))
      .agg(
        n.as("n_events"),
        round(sum(col("value")), 2).as("sum_value"),
        exactAvg(col("value"), n).as("avg_value"),
        max_by(col("value"), col("ts")).as("last_value"),
        concat_ws(" ",
          graft.functions.MinKAgg.minK(col("k"), maxTexts))
          .as("props_keys"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"), col("avg_value"),
        col("last_value"), col("props_keys"))
  }

  /** J2: the lambda-architecture batch join — two windowed metric legs
    * full-outer joined on (window_start, key), a key present in either leg
    * yields a row (reference batch_to_mongo.py:235; CoGroupByKey semantics
    * stream_join.py:519-524). Both legs share the (window, key) partitioning
    * so the join reuses the aggregation exchange.
    */
  def fullOuterMetricsJoin(left: DataFrame, right: DataFrame,
                           keys: Seq[String]): DataFrame =
    left.join(right, keys, "full_outer")
}

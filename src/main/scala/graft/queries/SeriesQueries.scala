package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{MetricOps, StatsOps, TimeSeriesOps, WindowOps}
import Catalog.Entry

/** Time-series + analytic-window suite (SURVEY.md §2.5 A11-A14/A17,
  * §2.6 W1-W6, §2.11 X2 batch analog).
  */
object SeriesQueries {

  /** DuckDB replay of [[graft.ops.TaOps.taSnapshot]] with the catalog's
    * parameters (SMA-20, RSI-14, MACD 12/26/9, VWAP-24h): the same fold
    * element struct doubles as the accumulator, so `list_reduce` (which
    * seeds from the first element) walks the identical IEEE op sequence
    * as Spark's `aggregate`.
    *
    * Two DuckDB traps this replay dodges (both measured, DuckDB 1.0):
    *   - `list_reduce` + `struct_pack` evaluates the pack fields
    *     SEQUENTIALLY, overwriting the accumulator in place — a later
    *     field referencing `acc.x` sees the NEW x. The pack is therefore
    *     ordered so every `acc.*` reference is to a not-yet-overwritten
    *     field (sig first, recomputing ef'/es' from the old state; prev
    *     last) — an order that is also correct under functional
    *     evaluation, so a fixed DuckDB keeps passing.
    *   - 17-digit decimal literals promote to a double via integer/10^17
    *     at runtime, which does NOT always equal the shortest-repr parse
    *     (measured on 1−2/13). Constants are therefore spelled as double
    *     fractions — `CAST(2 AS DOUBLE)/13` — the exact IEEE ops the
    *     Scala side runs.
    */
  private lazy val taOracleSql: String = {
    // smoothing constants as double-fraction SQL, mirroring TaOps'
    // aF = 2.0/(fast+1) etc. for the catalog params 12/26/9/14
    val aF = "(CAST(2 AS DOUBLE)/13)"; val omF = "(1 - CAST(2 AS DOUBLE)/13)"
    val aS = "(CAST(2 AS DOUBLE)/27)"; val omS = "(1 - CAST(2 AS DOUBLE)/27)"
    val aG = "(CAST(2 AS DOUBLE)/10)"; val omG = "(1 - CAST(2 AS DOUBLE)/10)"
    val aW = "(CAST(1 AS DOUBLE)/14)"; val omW = "(1 - CAST(1 AS DOUBLE)/14)"
    s"""
      WITH e AS (
        SELECT event_type, CAST(ts AS TIMESTAMP) AS t,
               CAST(value AS DOUBLE) AS v,
               CAST(CAST(regexp_extract(props, '"k": ([0-9]+)', 1)
                    AS BIGINT) AS DOUBLE) AS w
        FROM events),
      g AS (
        SELECT event_type,
               list(struct_pack(t := t, v := v, w := w) ORDER BY t, v, w)
                 AS series,
               count(*) AS n_points
        FROM e GROUP BY 1),
      f AS (
        SELECT event_type, series, n_points,
               series[CAST(n_points AS INTEGER)] AS last_e,
               list_reduce(
                 list_transform(series, x -> struct_pack(
                   sig := CAST(0.0 AS DOUBLE),
                   ef := x.v, es := x.v,
                   au := CAST(NULL AS DOUBLE),
                   ad := CAST(NULL AS DOUBLE),
                   prev := x.v)),
                 (acc, x) -> struct_pack(
                   sig := $aG * (($aF * x.prev + $omF * acc.ef)
                                 - ($aS * x.prev + $omS * acc.es))
                          + $omG * acc.sig,
                   ef := $aF * x.prev + $omF * acc.ef,
                   es := $aS * x.prev + $omS * acc.es,
                   au := CASE WHEN acc.au IS NULL
                           THEN greatest(x.prev - acc.prev,
                                         CAST(0.0 AS DOUBLE))
                           ELSE $aW * greatest(x.prev - acc.prev,
                                               CAST(0.0 AS DOUBLE))
                                + $omW * acc.au END,
                   ad := CASE WHEN acc.ad IS NULL
                           THEN greatest(acc.prev - x.prev,
                                         CAST(0.0 AS DOUBLE))
                           ELSE $aW * greatest(acc.prev - x.prev,
                                               CAST(0.0 AS DOUBLE))
                                + $omW * acc.ad END,
                   prev := x.prev)) AS st
        FROM g),
      f2 AS (
        SELECT event_type, n_points, last_e, st,
               list_reduce(
                 list_transform(
                   series[greatest(CAST(n_points AS INTEGER) - 19, 1)
                          :CAST(n_points AS INTEGER)],
                   x -> x.v),
                 (acc, x) -> acc + x) AS sma_sum,
               least(n_points, 20) AS sma_n,
               list_filter(series,
                 x -> x.t >= last_e.t - INTERVAL 24 HOUR) AS recent
        FROM f),
      f3 AS (
        SELECT event_type, n_points, last_e, st, sma_sum, sma_n,
               list_reduce(list_transform(recent, x -> x.v * x.w),
                           (acc, x) -> acc + x) AS sum_pv,
               list_reduce(list_transform(recent, x -> x.w),
                           (acc, x) -> acc + x) AS sum_w
        FROM f2)
      SELECT event_type, last_e.t AS ts_last, n_points,
             round(sma_sum / sma_n, 6) AS sma,
             round(CASE WHEN st.au IS NULL THEN NULL
                        WHEN st.ad = 0 AND st.au = 0 THEN NULL
                        WHEN st.ad = 0 THEN CAST(100.0 AS DOUBLE)
                        ELSE least(greatest(
                          100 - 100 / (1 + st.au / st.ad),
                          CAST(0.0 AS DOUBLE)),
                          CAST(100.0 AS DOUBLE)) END, 6) AS rsi,
             round(st.ef - st.es, 6) AS macd,
             round(st.sig, 6) AS macd_signal,
             round((st.ef - st.es) - st.sig, 6) AS macd_hist,
             round(sum_pv / nullif(sum_w, 0), 6) AS vwap24
      FROM f3"""
  }

  def defs: Map[String, Entry] = Map(

    // A11: resample-size counts (tweets-per-minute, Milestone3 cells 20-21).
    "a11_resample_counts" -> Entry(
      (s, dir) => TimeSeriesOps.resampleCounts(Tables.events(s, dir),
        "ts", "1 minute"),
      Some("""
        SELECT time_bucket(INTERVAL '1 minute', CAST(ts AS TIMESTAMP))
                 AS bucket,
               count(*) AS n
        FROM events GROUP BY 1""")),

    // A12 + W6: resample-last + forward-fill on a 30 s grid — the ARIMA
    // feed regularization (arima.py:229-235: .resample('30S').last().ffill()).
    "a12_resample_ffill" -> Entry(
      (s, dir) => TimeSeriesOps.resampleLastFfill(Tables.events(s, dir),
        "ts", "event_type", "value", 30),
      Some("""
        WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value
                   FROM events),
        b AS (SELECT event_type,
                     time_bucket(INTERVAL '30 seconds', ts) AS bucket,
                     arg_max(value, ts) AS last_val
              FROM e GROUP BY 1, 2),
        bounds AS (SELECT event_type, min(bucket) AS lo, max(bucket) AS hi
                   FROM b GROUP BY 1),
        grid AS (SELECT event_type,
                        unnest(generate_series(lo, hi,
                          INTERVAL '30 seconds')) AS bucket
                 FROM bounds),
        j AS (SELECT grid.event_type, grid.bucket, b.last_val
              FROM grid LEFT JOIN b
                ON grid.event_type = b.event_type
               AND grid.bucket = b.bucket),
        f AS (SELECT event_type, bucket, last_val,
                     count(last_val) OVER (
                       PARTITION BY event_type ORDER BY bucket
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS grp
              FROM j)
        SELECT event_type, bucket,
               max(last_val) OVER (PARTITION BY event_type, grp)
                 AS value_ffill
        FROM f""")),

    // A13: per-bin feature means (15-min bins, Milestone4 cells 10/20).
    "a13_bin_features" -> Entry(
      (s, dir) => {
        val n = count(lit(1))
        Tables.events(s, dir)
          .groupBy(window(col("ts"), "15 minutes"), col("event_type"))
          .agg(n.as("n_events"),
            MetricOps.exactAvg(col("value"), n).as("mean_value"),
            (sum((col("value") > 100).cast("long")).cast("double") / n)
              .as("share_gt100"))
          .select(col("window.start").as("bin_ts"), col("event_type"),
            col("n_events"), col("mean_value"), col("share_gt100"))
      },
      Some("""
        SELECT time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP))
                 AS bin_ts,
               event_type, count(*) AS n_events,
               round(sum(value), 2) / count(*) AS mean_value,
               CAST(sum(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*) AS share_gt100
        FROM events GROUP BY 1, 2""")),

    // A14: group-concat documents per bin (TF-IDF prep, Milestone4 cell 15).
    "a14_group_concat" -> Entry(
      (s, dir) => Tables.documents(s, dir)
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          concat_ws(" ", array_sort(collect_list(col("text"))))
            .as("doc_blob")),
      Some("""
        SELECT lang, source, count(*) AS n_docs,
               string_agg(text, ' ' ORDER BY text) AS doc_blob
        FROM documents GROUP BY 1, 2"""),
      scaleTwin = Some("a14_group_concat_capped")),

    // A14's bounded-shuffle twin — group-concat with only the 10
    // lexicographically-smallest docs per (lang, source) surviving,
    // enforced INSIDE the aggregation buffer (graft.functions.MinKAgg):
    // the uncapped entry above buffers and ships EVERY document body
    // through the shuffle into one row (the reference's notebook-scale
    // TF-IDF prep), which at corpus scale is a single-row OOM. Here
    // map-side partials carry at most 10 docs per (group, partition)
    // and n_docs still counts the full group — one scan, one
    // aggregation, bounded state.
    "a14_group_concat_capped" -> Entry(
      (s, dir) => Tables.documents(s, dir)
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          concat_ws(" ", graft.functions.MinKAgg.minK(col("text"), 10))
            .as("doc_blob_head")),
      // oracle is one grouped pass (FILTER instead of a head-side
      // join): a join back on (lang, source) would silently drop a
      // NULL-keyed group (USING equality rejects NULL = NULL), and the
      // rank orders null texts last EXPLICITLY rather than leaning on
      // the engine's default_null_order
      Some("""
        WITH t AS (SELECT lang, source, text,
                          row_number() OVER (PARTITION BY lang, source
                            ORDER BY (text IS NULL), text) AS rn
                   FROM documents)
        SELECT lang, source, count(*) AS n_docs,
               coalesce(string_agg(text, ' ' ORDER BY text)
                 FILTER (WHERE rn <= 10 AND text IS NOT NULL), '')
                 AS doc_blob_head
        FROM t GROUP BY 1, 2""")),

    // A17/X6: MAE/MAPE/MSE of the naive last-value forecast, with the
    // reference's 1e-8 denominator clamp (arima.py:123-137).
    "a17_error_metrics" -> Entry(
      (s, dir) => {
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("ts"), col("event_id"))
        val withPrev = Tables.events(s, dir)
          .withColumn("prev", lag(col("value"), 1).over(w))
        TimeSeriesOps.errorMetrics(withPrev, "event_type", "value", "prev")
      },
      Some("""
        WITH p AS (
          SELECT event_type, value,
                 lag(value, 1) OVER (PARTITION BY event_type
                   ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev
          FROM events)
        SELECT event_type, count(*) AS n,
               round(avg(abs(value - prev)), 4) AS mae,
               round(avg((value - prev) * (value - prev)), 4) AS mse,
               round(avg(abs((value - prev) /
                 greatest(abs(value), 1e-8))) * 100, 4) AS mape
        FROM p WHERE prev IS NOT NULL GROUP BY 1""")),

    // W1-W3: diff / pct_change / lag features per key
    // (Milestone3 cells 40/52/54).
    "w1w3_windows" -> Entry(
      (s, dir) => {
        val w = WindowOps.keyedWindow("user_id", Seq("ts", "event_id"))
        Tables.events(s, dir)
          .withColumn("value_diff", WindowOps.diff(col("value"), w))
          .withColumn("value_pct_change",
            WindowOps.pctChange(col("value"), w))
          .withColumn("prev_value", lag(col("value"), 1).over(w))
          .select(col("event_id"), col("user_id"), col("value"),
            col("prev_value"), col("value_diff"), col("value_pct_change"))
      },
      Some("""
        SELECT event_id, user_id, value,
               lag(value, 1) OVER w AS prev_value,
               value - lag(value, 1) OVER w AS value_diff,
               value / nullif(lag(value, 1) OVER w, 0) - 1
                 AS value_pct_change
        FROM events
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY CAST(ts AS TIMESTAMP), event_id)""")),

    // W4 + F13: lead target — next-step log return (Milestone4 cells 10/20).
    "w4_lead_target" -> Entry(
      (s, dir) => {
        val w = WindowOps.keyedWindow("event_type", Seq("ts", "event_id"))
        // ln(0) -> null via nullif guard (null-on-failure semantics, P4)
        val lv = log(nullif(col("value"), lit(0)))
        Tables.events(s, dir)
          .withColumn("log_value", lv)
          .withColumn("target_ret_next",
            round(lead(lv, 1).over(w) - lv, 6))
          .select(col("event_id"), col("event_type"),
            round(col("log_value"), 6).as("log_value"),
            col("target_ret_next"))
      },
      Some("""
        SELECT event_id, event_type,
               round(ln(nullif(value, 0)), 6) AS log_value,
               round(lead(ln(nullif(value, 0)), 1) OVER (
                 PARTITION BY event_type
                 ORDER BY CAST(ts AS TIMESTAMP), event_id)
                 - ln(nullif(value, 0)), 6) AS target_ret_next
        FROM events""")),

    // W5: normalize-to-first per key (Milestone4 cells 8/19).
    "w5_normalize_first" -> Entry(
      (s, dir) => {
        val w = WindowOps.keyedWindow("user_id", Seq("ts", "event_id"))
        Tables.events(s, dir)
          .withColumn("value_norm",
            WindowOps.normalizeToFirst(col("value"), w))
          .select(col("event_id"), col("user_id"), col("value"),
            col("value_norm"))
      },
      Some("""
        SELECT event_id, user_id, value,
               value / nullif(first_value(value) OVER (PARTITION BY user_id
                 ORDER BY CAST(ts AS TIMESTAMP), event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
                 AS value_norm
        FROM events""")),

    // Beyond the reference (SURVEY.md §2.10 notes sliding/session windows
    // unused there): sliding 10-min windows every 5 min — each event lands
    // in exactly two epoch-aligned windows.
    "t2_sliding_window" -> Entry(
      (s, dir) => Tables.events(s, dir)
        .groupBy(window(col("ts"), "10 minutes", "5 minutes"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value")), 2).as("sum_value"))
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n"), col("sum_value")),
      Some("""
        WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value
                   FROM events),
        x AS (SELECT time_bucket(INTERVAL '5 minutes', ts) AS ws,
                     event_type, value FROM e
              UNION ALL
              SELECT time_bucket(INTERVAL '5 minutes', ts)
                       - INTERVAL '5 minutes', event_type, value FROM e)
        SELECT ws AS window_start, event_type, count(*) AS n,
               round(sum(value), 2) AS sum_value
        FROM x GROUP BY 1, 2""")),

    // Beyond the reference: session windows (5-min inactivity gap per
    // user) — the gaps-and-islands formulation mirrors Spark's
    // session_window semantics exactly (session start = first event,
    // membership = consecutive gaps < gap).
    "t_session_window" -> Entry(
      (s, dir) => Tables.events(s, dir)
        .groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("sum_value"))
        .select(col("session_window.start").as("session_start"),
          col("user_id"), col("n_events"), col("sum_value")),
      Some("""
        WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, user_id, value
                   FROM events),
        flags AS (
          SELECT ts, user_id, value,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR ts - lag(ts) OVER w >= INTERVAL '5 minutes'
                      THEN 1 ELSE 0 END AS new_s
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        sess AS (
          SELECT ts, user_id, value,
                 sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
          FROM flags)
        SELECT min(ts) AS session_start, user_id, count(*) AS n_events,
               round(sum(value), 2) AS sum_value
        FROM sess GROUP BY user_id, sid""")),

    // X2 (batch analog): drift forecast — next value = value + last step
    // (streaming stateful form: graft.streaming.DriftForecaster).
    "x2_drift_forecast" -> Entry(
      (s, dir) => TimeSeriesOps.driftForecast(Tables.events(s, dir),
        "event_type", Seq("ts", "event_id"), "value")
        .select(col("event_id"), col("event_type"), col("value"),
          col("forecast_next")),
      Some("""
        SELECT event_id, event_type, value,
               CASE WHEN lag(value, 1) OVER w IS NOT NULL
                    THEN value + (value - lag(value, 1) OVER w) END
                 AS forecast_next
        FROM events
        WINDOW w AS (PARTITION BY event_type
                     ORDER BY CAST(ts AS TIMESTAMP), event_id)""")),

    // North-star smoothing: final EWMA per key (s_i = α·x_i + (1−α)·s_{i-1},
    // init = first observation). Non-associative recursion → collect+fold
    // fan-in (TimeSeriesOps.ewmaLast scaladoc); both engines fold
    // left-to-right in double, so the result hash-matches at 6 digits.
    "ts_ewma" -> Entry(
      (s, dir) => graft.ops.TimeSeriesOps.ewmaLast(
        Tables.events(s, dir), "event_type", "ts", "value", 0.2),
      Some(s"""
        SELECT event_type, count(*) AS n_points,
               round(list_reduce(
                 list(CAST(value AS DOUBLE)
                      ORDER BY CAST(ts AS TIMESTAMP), value),
                 (acc, x) -> ${0.2} * x + ${1 - 0.2} * acc), 6)
                 AS ewma_last
        FROM events GROUP BY 1""")),

    // TA-indicator snapshot (the reference's TA record type,
    // coincap/main.py:97-108): per symbol — SMA-20, Wilder RSI-14,
    // MACD 12/26/9 and trailing-24h VWAP at the latest tick, with volume
    // parsed out of the JSON props. Both engines run the identical
    // left-to-right fold (TaOps scaladoc); indicator outputs round 6.
    "ta_indicators" -> Entry(
      (s, dir) => graft.ops.TaOps.taSnapshot(
        Tables.events(s, dir).withColumn("vol",
          get_json_object(col("props"), "$.k").cast("double")),
        "event_type", "ts", "value", "vol"),
      Some(taOracleSql)),

    // Rolling z-score anomaly flags over the event stream: each value is
    // scored against the mean/std of the 24 points strictly before it in
    // its event_type series (self-excluding trailing frame). Values are
    // quantized to cents first, so every baseline stat follows the
    // integer-exact rollingStats algebra and the raw doubles hash-match;
    // warm-up and zero-variance frames flag false via the nullif chain.
    // CATALOG DEFAULT = the CHUNKED form (r12, per the r11 verdict):
    // the plain per-key window caps parallelism at the key count (4
    // event types -> 4 window tasks; measured exponent 0.60-0.62), so
    // the scale posture — (key, chunk)-parallel windows over 4096-row
    // chunks carrying a 24-row frame overlap — owns the default name.
    // The plain reference-faithful keying stays as the probe row below
    // (ts_anomaly_zscore_plain); outputs are row-identical (spec-pinned)
    // so both share the same DuckDB window oracle.
    "ts_anomaly_zscore" -> Entry(
      (s, dir) => TimeSeriesOps.rollingZScoreAnomalyChunked(
        Tables.events(s, dir)
          .withColumn("value_cents", round(col("value") * 100)
            .cast("long")),
        "event_type", Seq("ts", "event_id"), "value_cents",
        nRows = 24, z = 3.0, tsCol = "ts"),
      Some("""
        WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts,
                          event_type,
                          CAST(round(value * 100) AS BIGINT) AS v
                   FROM events)
        SELECT event_type, ts, event_id, v AS value,
               count(*) OVER w AS base_n,
               sum(v) OVER w / count(*) OVER w AS base_mean,
               sqrt((sum(v*v) OVER w
                     - (sum(v) OVER w) * (sum(v) OVER w)
                       / count(*) OVER w)
                    / nullif(count(*) OVER w - 1, 0)) AS base_std,
               (v - sum(v) OVER w / count(*) OVER w)
                 / nullif(sqrt((sum(v*v) OVER w
                     - (sum(v) OVER w) * (sum(v) OVER w)
                       / count(*) OVER w)
                    / nullif(count(*) OVER w - 1, 0)), 0.0) AS zscore,
               coalesce(abs((v - sum(v) OVER w / count(*) OVER w)
                 / nullif(sqrt((sum(v*v) OVER w
                     - (sum(v) OVER w) * (sum(v) OVER w)
                       / count(*) OVER w)
                    / nullif(count(*) OVER w - 1, 0)), 0.0)) > 3.0,
                 false) AS is_anomaly
        FROM e
        WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                     ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)""")),

    // PLAIN twin of ts_anomaly_zscore — the reference-faithful single
    // window per key, kept as the probe row beside the chunked catalog
    // default (the a1a4_windowed_metrics / _capped pattern): its
    // per-key window caps parallelism at the key count, which is the
    // measured 0.60-0.62 exponent SCALE.md documents. Output is
    // row-identical to the chunked form (spec-pinned), so the SAME
    // DuckDB window oracle verifies it. (Was named
    // ts_anomaly_zscore_chunked/_zscore swapped before r12.)
    "ts_anomaly_zscore_plain" -> Entry(
      (s, dir) => TimeSeriesOps.rollingZScoreAnomaly(
        Tables.events(s, dir)
          .withColumn("value_cents", round(col("value") * 100)
            .cast("long")),
        "event_type", Seq("ts", "event_id"), "value_cents",
        nRows = 24, z = 3.0),
      Some("""
        WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts,
                          event_type,
                          CAST(round(value * 100) AS BIGINT) AS v
                   FROM events)
        SELECT event_type, ts, event_id, v AS value,
               count(*) OVER w AS base_n,
               sum(v) OVER w / count(*) OVER w AS base_mean,
               sqrt((sum(v*v) OVER w
                     - (sum(v) OVER w) * (sum(v) OVER w)
                       / count(*) OVER w)
                    / nullif(count(*) OVER w - 1, 0)) AS base_std,
               (v - sum(v) OVER w / count(*) OVER w)
                 / nullif(sqrt((sum(v*v) OVER w
                     - (sum(v) OVER w) * (sum(v) OVER w)
                       / count(*) OVER w)
                    / nullif(count(*) OVER w - 1, 0)), 0.0) AS zscore,
               coalesce(abs((v - sum(v) OVER w / count(*) OVER w)
                 / nullif(sqrt((sum(v*v) OVER w
                     - (sum(v) OVER w) * (sum(v) OVER w)
                       / count(*) OVER w)
                    / nullif(count(*) OVER w - 1, 0)), 0.0)) > 3.0,
                 false) AS is_anomaly
        FROM e
        WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                     ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)"""),
      // probe: plain per-key window — parallelism capped at the key
      // count (measured exp 0.60-0.62); the chunked default above is
      // the scale posture
      probe = true),

    // W-rolling: pandas groupby().rolling(5, min_periods=1) mean/std/
    // min/max over the per-supplier shipment series. Exactness: quantities
    // are integer-valued, so every 5-row frame sum is IEEE-exact in any
    // accumulation order and the std algebra (see WindowOps.rollingStats)
    // evaluates to the same bits in Spark and DuckDB; one-row frames give
    // NULL std in both.
    // ORDER tiebreak: (shipdate, orderkey, linenumber) is NOT unique in
    // the synthetic lineitem (one full collision at sf0.1), so the value
    // column joins the ordering — engines then agree on every frame, and
    // rows still colliding on ALL five columns are identical rows, whose
    // permutation cannot change any output (hash compare is row-set
    // based).
    "w_rolling_stats" -> Entry(
      (s, dir) => WindowOps.rollingStats(Tables.lineitem(s, dir),
        "l_suppkey",
        Seq("l_shipdate", "l_orderkey", "l_linenumber", "l_quantity"),
        "l_quantity", 5),
      Some("""
        SELECT l_suppkey, CAST(l_shipdate AS TIMESTAMP) AS l_shipdate,
               l_orderkey, l_linenumber, l_quantity,
               count(*) OVER w AS roll_n,
               sum(l_quantity) OVER w AS roll_sum,
               sum(l_quantity) OVER w / count(*) OVER w AS roll_mean,
               min(l_quantity) OVER w AS roll_min,
               max(l_quantity) OVER w AS roll_max,
               sqrt((sum(l_quantity * l_quantity) OVER w
                     - (sum(l_quantity) OVER w) * (sum(l_quantity) OVER w)
                       / count(*) OVER w)
                    / nullif(count(*) OVER w - 1, 0)) AS roll_std
        FROM lineitem
        WINDOW w AS (PARTITION BY l_suppkey
                     ORDER BY CAST(l_shipdate AS TIMESTAMP), l_orderkey,
                              l_linenumber, l_quantity
                     ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)"""))
  )
}

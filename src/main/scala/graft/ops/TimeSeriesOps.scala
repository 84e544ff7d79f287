package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization + model-quality metrics
  * (SURVEY.md §2.5 A11/A12/A17, §2.6 W6).
  */
object TimeSeriesOps {

  /** A11: time-bucket counts (tweets-per-minute, Milestone3 cells 20-21). */
  def resampleCounts(df: DataFrame, timeCol: String, dur: String): DataFrame =
    df.groupBy(window(col(timeCol), dur))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("bucket"), col("n"))

  /** A12: the canonical ARIMA-feed regularization — resample to a fixed
    * grid with `last` per bucket, then forward-fill gaps per key
    * (reference analytical_module/arima.py:229-235,338-344:
    * `.resample(rule).last().ffill()`).
    *
    * Grid generation is distributed: one `sequence()` per key spanning
    * that key's OWN [min,max] bucket range (pandas' per-series
    * `.resample().last().ffill()` semantics — a key neither back-fills
    * before its first observation nor keeps filling past its last),
    * exploded into rows; observed buckets left-join onto the grid; ffill
    * via the gaps-and-islands trick (WindowOps.forwardFill).
    * Scale: grid size = span/step per key — partitioned by key, so a
    * 1000-executor cluster fills each key's series independently.
    */
  def resampleLastFfill(df: DataFrame, timeCol: String, keyCol: String,
                        valCol: String, stepSeconds: Int): DataFrame = {
    val step = stepSeconds
    val bucketed = df
      .withColumn("bucket",
        timestamp_seconds(floor(unix_timestamp(col(timeCol)) / step) * step))
      .groupBy(col(keyCol), col("bucket"))
      .agg(max_by(col(valCol), col(timeCol)).as("last_val"))

    val grid = bucketed.groupBy(col(keyCol))
      .agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
      .select(col(keyCol),
        explode(sequence(col("lo"), col("hi"),
          expr(s"interval $step seconds"))).as("bucket"))

    val joined = grid.join(bucketed, Seq(keyCol, "bucket"), "left")
    graft.ops.WindowOps.forwardFill(joined, keyCol, Seq("bucket"),
        "last_val", "value_ffill")
      .drop("last_val")
  }

  /** A17/X6: forecast error metrics MAE / MAPE / MSE with the reference's
    * 1e-8 clamp on the denominator (arima.py:123-137).
    * Doubles are rounded for hash-stable comparison.
    */
  def errorMetrics(df: DataFrame, keyCol: String, actual: String,
                   predicted: String): DataFrame = {
    val err = col(actual) - col(predicted)
    df.filter(col(predicted).isNotNull)
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n"),
        round(avg(abs(err)), 4).as("mae"),
        round(avg(pow(err, 2)), 4).as("mse"),
        round(avg(abs(err / greatest(abs(col(actual)), lit(1e-8)))) * 100, 4)
          .as("mape"))
  }

  /** X2 (batch analog): drift forecast — predict the next observation as
    * `value + (value - lag(value))`, i.e. last step repeated. The streaming
    * stateful form lives in graft.streaming.DriftForecaster; this batch
    * form backtests it over history with one window shuffle.
    */
  def driftForecast(df: DataFrame, keyCol: String, orderCols: Seq[String],
                    valCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
    df.withColumn("prev", lag(col(valCol), 1).over(w))
      .withColumn("forecast_next",
        when(col("prev").isNotNull,
          col(valCol) + (col(valCol) - col("prev"))))
      .drop("prev")
  }

  /** Exponentially weighted moving average, final value per key:
    * s_1 = x_1, s_i = α·x_i + (1−α)·s_{i-1} over the series ordered by
    * (tsCol, value) — pandas `ewm(alpha, adjust=False).mean().iloc[-1]`,
    * the smoothing the reference's notebooks apply to price series.
    *
    * The recursion is non-associative, so it cannot be a window sum; the
    * scalable form is the same collect-then-fold fan-in as the AR trainer
    * (A5/X5: one shuffle, per-key series must fit an executor — holds for
    * per-symbol price history; 2M points ≈ 32 MB). The fold runs inside
    * `functions.aggregate`, left-to-right in double, so results are
    * bit-comparable across engines (DuckDB `list_reduce` replays it).
    * For per-row smoothed output use [[WindowOps]] patterns or the
    * streaming `DriftForecaster`-style stateful op instead.
    */
  def ewmaLast(df: DataFrame, keyCol: String, tsCol: String,
               valCol: String, alpha: Double): DataFrame = {
    val collected = df.groupBy(col(keyCol)).agg(
      count(lit(1)).as("n_points"),
      array_sort(collect_list(struct(col(tsCol).as("t"),
        col(valCol).cast("double").as("v")))).as("series"))
    collected.select(col(keyCol), col("n_points"),
      round(aggregate(
        slice(col("series"), lit(2), size(col("series")) - 1),
        element_at(col("series"), 1).getField("v"),
        (acc, x) => lit(alpha) * x.getField("v") + lit(1 - alpha) * acc),
        6).as("ewma_last"))
  }

  /** Rolling z-score anomaly detection — the standard streaming-sensor /
    * price-spike outlier filter: each point is scored against the mean
    * and sample-std of the `nRows` points STRICTLY BEFORE it in its
    * series (the trailing frame excludes the current row, so a spike
    * cannot mask itself by inflating its own baseline). One window pass
    * per key, no shuffle beyond the keyed sort.
    *
    * Numeric parity: the std uses the same exact sum/sum-of-squares
    * algebra as [[WindowOps.rollingStats]] — feed an integer-valued
    * column (quantize currency to cents first) and every baseline stat
    * is bit-identical across engines and partition layouts. Warm-up rows
    * (empty frame) and zero-variance frames score null and flag false.
    *
    * MAGNITUDE BOUND: the sum-of-squares accumulates in 64-bit Long for
    * an integer `valueCol`, so the caller must keep
    * `nRows * max(value)^2 < 2^63` — i.e. |value| <= sqrt(2^63/nRows)
    * (~6.2e8 at nRows=24; cents-quantized prices up to ~$6.2M). Beyond
    * that Spark's non-ANSI Long arithmetic wraps SILENTLY while wider
    * engines (DuckDB sums BIGINT into HUGEINT) keep going, so the std
    * goes quietly wrong and engines diverge at different points. The
    * streaming twin [[graft.streaming.StreamingAnomaly.score]] uses the
    * same Long algebra deliberately (split-batch == batch bitwise) and
    * inherits the same bound; quantize on a coarser grid (e.g. whole
    * units, not cents) if values can exceed it.
    */
  def rollingZScoreAnomaly(df: DataFrame, keyCol: String,
                           orderCols: Seq[String], valueCol: String,
                           nRows: Int, z: Double): DataFrame = {
    require(nRows >= 2 && z > 0, s"nRows=$nRows z=$z")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(-nRows.toLong, -1L)
    val v = col(valueCol)
    val n = count(lit(1)).over(w)
    val s = sum(v).over(w)
    val sq = sum(v * v).over(w)
    val mean = s / n
    val std = sqrt((sq - s * s / n) / nullif(n - lit(1), lit(0)))
    val zscore = (v - mean) / nullif(std, lit(0.0))
    df.select((col(keyCol) +: orderCols.map(col)) ++ Seq(
      v.as("value"),
      n.as("base_n"), mean.as("base_mean"), std.as("base_std"),
      zscore.as("zscore"),
      coalesce(abs(zscore) > lit(z), lit(false)).as("is_anomaly")): _*)
  }

  /** [[rollingZScoreAnomaly]] in its CHUNKED scale form — identical
    * output, but the per-key sequential window is broken into
    * independently-processed pieces so parallelism is keys × chunks
    * instead of keys (the plain form is key-cardinality-bound: at 4
    * event types a 32-core host runs 4 window tasks; SCALE.md measured
    * exponent 0.59 for exactly this reason).
    *
    * Construction (every pass is (key, chunk)-parallel):
    *  1. global per-key row numbers WITHOUT a per-key sequential pass:
    *     rank within (key, time-chunk) — `tsCol` floored to
    *     `spanSeconds` — plus the prefix-sum of per-time-chunk counts
    *     (a tiny aggregate, broadcast back; time-chunking is consistent
    *     with the (ts, ...) sort order because the chunk is a function
    *     of ts alone);
    *  2. fixed `chunkRows`-row chunks from those row numbers, with each
    *     chunk's last `nRows` rows DUPLICATED into the next chunk as
    *     warm-up carry (chunkRows > nRows makes the carry always
    *     sufficient — the frame never reaches past the previous chunk);
    *  3. the same trailing (-nRows, -1) frame over (key, chunk), ordered
    *     by the global row number, then the carried rows drop.
    *
    * Same sum/sum-of-squares algebra, same null/zero-variance rules, so
    * rows are bit-identical to the plain form (spec-pinned) and the same
    * DuckDB window oracle verifies both. The extra cost is one small
    * aggregate + broadcast join and the carry duplication
    * (nRows/chunkRows overhead); buy it when keys ≪ cores.
    */
  def rollingZScoreAnomalyChunked(df: DataFrame, keyCol: String,
                                  orderCols: Seq[String], valueCol: String,
                                  nRows: Int, z: Double, tsCol: String,
                                  chunkRows: Int = 4096,
                                  spanSeconds: Long = 3600L): DataFrame = {
    require(nRows >= 2 && z > 0, s"nRows=$nRows z=$z")
    require(chunkRows > nRows, s"chunkRows=$chunkRows must exceed nRows=$nRows")
    require(spanSeconds > 0, s"spanSeconds=$spanSeconds")
    // the global row number is built over (_tc, orderCols); that equals
    // the plain form's orderCols ordering ONLY when the time-chunk is a
    // monotone function of the leading sort key — i.e. orderCols must
    // lead with tsCol, or frames silently contain different rows
    require(orderCols.headOption.contains(tsCol),
      s"orderCols must lead with tsCol='$tsCol' (got $orderCols): the " +
        "chunk key floor(ts/span) is only order-consistent with the " +
        "plain form's window when ts is the primary sort key")
    val base = df.withColumn("_tc",
      floor(col(tsCol).cast("long") / lit(spanSeconds)).cast("long"))
    val wIn = Window.partitionBy(col(keyCol), col("_tc"))
      .orderBy(orderCols.map(col): _*)
    val ranked = base.withColumn("_rin", row_number().over(wIn).cast("long"))
    val wCum = Window.partitionBy(col(keyCol)).orderBy(col("_tc"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy(col(keyCol), col("_tc"))
      .agg(count(lit(1)).as("_cnt"))
      .withColumn("_off", coalesce(sum(col("_cnt")).over(wCum), lit(0L)))
      .select(col(keyCol), col("_tc"), col("_off"))
    // null-SAFE join: a null key (or null ts -> null _tc) is a real
    // window partition in the plain form — plain equality would silently
    // drop those rows and break the row-identity contract
    val rn = ranked.alias("_zl")
      .join(broadcast(offsets.alias("_zr")),
        col(s"_zl.`$keyCol`") <=> col(s"_zr.`$keyCol`") &&
          col("_zl._tc") <=> col("_zr._tc"))
      .select(col("_zl.*"), col("_zr._off"))
      .withColumn("_rn", col("_off") + col("_rin"))
    val real = rn
      .withColumn("_ck", floor((col("_rn") - 1) / lit(chunkRows)).cast("long"))
      .withColumn("_warm", lit(false))
    val carry = rn
      .filter(pmod(col("_rn") - 1, lit(chunkRows.toLong)) >=
        lit((chunkRows - nRows).toLong))
      .withColumn("_ck",
        floor((col("_rn") - 1) / lit(chunkRows)).cast("long") + 1)
      .withColumn("_warm", lit(true))
    val w = Window.partitionBy(col(keyCol), col("_ck"))
      .orderBy(col("_rn"))
      .rowsBetween(-nRows.toLong, -1L)
    val v = col(valueCol)
    val n = count(lit(1)).over(w)
    val s = sum(v).over(w)
    val sq = sum(v * v).over(w)
    val mean = s / n
    val std = sqrt((sq - s * s / n) / nullif(n - lit(1), lit(0)))
    val zscore = (v - mean) / nullif(std, lit(0.0))
    real.unionByName(carry)
      .select((Seq(col(keyCol)) ++ orderCols.map(col) ++ Seq(
        v.as("value"),
        n.as("base_n"), mean.as("base_mean"), std.as("base_std"),
        zscore.as("zscore"),
        coalesce(abs(zscore) > lit(z), lit(false)).as("is_anomaly"),
        col("_warm"))): _*)
      .filter(!col("_warm"))
      .drop("_warm")
  }
}

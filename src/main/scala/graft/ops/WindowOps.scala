package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytic (per-key ordered) window functions — SURVEY.md §2.6 W1-W6.
  * All reference uses are pandas groupby+shift family; here they are
  * `Window.partitionBy(key).orderBy(time)` expressions, which Spark executes
  * with a single shuffle on the key and a sort within partitions.
  *
  * Ordering must be total for deterministic results, so every ordering
  * includes a unique tiebreaker column.
  */
object WindowOps {

  def keyedWindow(key: String, order: Seq[String]) =
    Window.partitionBy(col(key)).orderBy(order.map(col): _*)

  /** W1: 1-step diff (pandas groupby().diff(), Milestone3 cells 40/46). */
  def diff(c: Column, w: org.apache.spark.sql.expressions.WindowSpec): Column =
    c - lag(c, 1).over(w)

  /** W2: pct_change (Milestone3 cell 52). Zero previous value -> null
    * (the engine-wide null-on-failure semantics, SURVEY.md P4) rather than
    * an ANSI divide-by-zero error or pandas' inf.
    */
  def pctChange(c: Column, w: org.apache.spark.sql.expressions.WindowSpec): Column =
    c / nullif(lag(c, 1).over(w), lit(0)) - 1

  /** W5: normalize-to-first per key (Milestone4 cells 8/19); zero first
    * value -> null, as in pctChange.
    */
  def normalizeToFirst(c: Column, w: org.apache.spark.sql.expressions.WindowSpec): Column =
    c / nullif(first(c).over(w.rowsBetween(Window.unboundedPreceding, 0)),
      lit(0))

  /** Rolling (moving) frame statistics per key — the pandas
    * `groupby(key).rolling(n, min_periods=1)` family (mean/std/min/max)
    * the reference's notebook milestones apply to resampled price series.
    * One `WindowExec` over a single shuffle on the key: every statistic
    * shares the same `ROWS BETWEEN n-1 PRECEDING AND CURRENT ROW` spec,
    * so Spark evaluates them in one pass per partition.
    *
    * Exactness contract (why std is spelled out as algebra): the sample
    * std is computed as `sqrt((sum_sq - sum^2/n) / (n-1))` from frame
    * `sum`/`sum_sq`/`count` rather than `stddev_samp` — Spark returns NaN
    * for a one-row sample where SQL engines return NULL, and the explicit
    * formula evaluates identically (same IEEE op tree) in any engine. On
    * integer-valued inputs every frame sum is exact regardless of the
    * engine's internal accumulation order, so results are bit-stable
    * across engines; one-row frames yield NULL std via `nullif(n-1, 0)`.
    */
  def rollingStats(df: DataFrame, key: String, orderCols: Seq[String],
                   valueCol: String, nRows: Int): DataFrame = {
    require(nRows >= 1, s"nRows=$nRows must be >= 1")
    val w = Window.partitionBy(col(key)).orderBy(orderCols.map(col): _*)
      .rowsBetween(-(nRows - 1).toLong, 0)
    val v = col(valueCol)
    val n = count(lit(1)).over(w)
    val s = sum(v).over(w)
    val sq = sum(v * v).over(w)
    df.select(
      (col(key) +: orderCols.map(col)) ++ Seq(
        n.as("roll_n"),
        s.as("roll_sum"),
        (s / n).as("roll_mean"),
        min(v).over(w).as("roll_min"),
        max(v).over(w).as("roll_max"),
        sqrt((sq - s * s / n) / nullif(n - lit(1), lit(0))).as("roll_std")
      ): _*)
  }

  /** W6/A12 helper: forward-fill nulls without a UDF via gaps-and-islands:
    * `grp = count(c) over (key order by t)` increments exactly when c is
    * non-null, so `max(c) over (key, grp)` broadcasts the last non-null
    * value forward. Chosen over `last(c, ignoreNulls)` because the same
    * formulation runs verbatim in the DuckDB oracle.
    */
  def forwardFill(df: DataFrame, key: String, orderCols: Seq[String],
                  valueCol: String, outCol: String): DataFrame = {
    val wOrd = Window.partitionBy(col(key)).orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val withGrp = df.withColumn("_ffill_grp", count(col(valueCol)).over(wOrd))
    val wGrp = Window.partitionBy(col(key), col("_ffill_grp"))
    withGrp.withColumn(outCol, max(col(valueCol)).over(wGrp))
      .drop("_ffill_grp")
  }
}

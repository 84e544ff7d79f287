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

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series join operators Spark lacks as built-ins: as-of join and
  * banded range join. Both are composed from existing operators
  * (SURVEY.md §7 preference (a)) in the shape that survives 100 TB.
  *
  * Why not a naive range join: Catalyst plans `l JOIN r ON l.k = r.k AND
  * r.t BETWEEN ...` as a sort-merge on the equi-key with a per-key
  * cross-filter — O(n·m) within hot keys, and an as-of join expressed that
  * way needs a max_by on top. The formulations here instead:
  *
  *  - as-of: union both sides, one shuffle+sort by (key, time), a running
  *    last-non-null window — O((n+m) log) per key partition, exactly one
  *    shuffle, no join at all. This is the classic "union trick" every
  *    kdb/Flink/QuestDB engine uses under the hood.
  *  - range join: quantize time into bands of the range width; each left
  *    row probes its own band and the next — the join key becomes
  *    (key, band), so the equi-join stays hash/sort-mergeable and each
  *    probe touches at most 2 bands instead of the whole key history.
  */
object AsOfJoinOps {

  /** For each left row, the most recent right `valueCol` with
    * `right.time <= left.time` and equal keys (null when no prior right
    * row). Right rows at the exact left timestamp win ("at or before");
    * among equal-time right rows the tie-break column decides (last wins).
    *
    * The carried value keeps `right(valueCol)`'s native type (string,
    * decimal, struct, ... — anything a column can hold): each island
    * contains at most one right row, so `first(ignoreNulls)` over the
    * island is deterministic and needs no ordering or comparability.
    *
    * Output: all `left` columns + `asofCol` (typed as `right(valueCol)`).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               timeCol: String, tieCol: String, valueCol: String,
               asofCol: String = "asof_value"): DataFrame = {
    val vType = right.schema(valueCol).dataType
    val l = left.withColumn("_is_left", lit(1))
      .withColumn("_r_value", lit(null).cast(vType))
    val r = right.select(col(keyCol), col(timeCol), col(tieCol),
        col(valueCol).cast(vType).as("_r_value"))
      .withColumn("_is_left", lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
    // right rows order before left rows at the same instant => "at or
    // before" includes same-timestamp right values
    val ord = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol), col("_is_left"), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // gaps-and-islands forward fill: island id = count of right rows so
    // far; each island holds exactly one right value, so first(ignoreNulls)
    // is deterministic and type-agnostic (no max/ordering needed)
    val filled = u.withColumn("_grp", count(col("_r_value")).over(ord))
      .withColumn(asofCol, first(col("_r_value"), ignoreNulls = true)
        .over(Window.partitionBy(col(keyCol), col("_grp"))))
    filled.filter(col("_is_left") === 1)
      .drop("_is_left", "_r_value", "_grp")
  }

  /** For each left row, count + sum of right values with equal key and
    * `right.time` in `(left.time, left.time + rangeSec]` — zero-filled for
    * left rows with no matches. The equi-join key is (key, band) with
    * band = floor(time / rangeSec); every right match lies in the left
    * row's band or the next, so the left side probes exactly 2 bands.
    *
    * Output: leftIdCol, keyCol, n_follow, sum_follow.
    */
  def rangeJoinCount(left: DataFrame, right: DataFrame, keyCol: String,
                     timeCol: String, leftIdCol: String, valueCol: String,
                     rangeSec: Int): DataFrame = {
    val band = (unix_timestamp(col(timeCol)) / rangeSec).cast("long")
    val l = left.select(col(leftIdCol), col(keyCol),
        col(timeCol).as("_lt"), band.as("_b"))
      .withColumn("_band", explode(array(col("_b"), col("_b") + 1)))
    val r = right.select(col(keyCol), col(timeCol).as("_rt"),
      col(valueCol).as("_rv"), band.as("_band"))
    val matched = l.join(r, Seq(keyCol, "_band"))
      .filter(col("_rt") > col("_lt") &&
        col("_rt") <= col("_lt") + expr(s"INTERVAL $rangeSec SECONDS"))
      .groupBy(col(leftIdCol))
      .agg(count(lit(1)).as("n_follow"),
        round(sum(col("_rv")), 2).as("sum_follow"))
    left.select(col(leftIdCol), col(keyCol))
      .join(matched, Seq(leftIdCol), "left")
      .select(col(leftIdCol), col(keyCol),
        coalesce(col("n_follow"), lit(0L)).as("n_follow"),
        coalesce(col("sum_follow"), lit(0.0)).as("sum_follow"))
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Projections, filters, explodes, joins, sorts, set ops
  * (SURVEY.md §2.2, §2.3, §2.4, §2.7, §2.8).
  */
object RelationalOps {

  /** P2 + F18 + P4: semi-structured payload parse. The reference decodes a
    * Pub/Sub payload to MAP<STRING,STRING> then projects typed fields with
    * null-on-failure casts (batch_to_mongo.py:125-153). Here: JSON string
    * column -> map -> typed projection. Stays fully inside whole-stage
    * codegen (JsonToStructs + Cast), no UDF.
    */
  def parseJsonProps(df: DataFrame, jsonCol: String = "props"): DataFrame =
    df.withColumn("_m",
        from_json(col(jsonCol), MapType(StringType, StringType)))
      .withColumn("prop_k", col("_m").getItem("k").cast(LongType))
      .drop("_m")

  /** E1/E2: wide->long unpivot via explode(array(struct(..))) — exactly the
    * reference's price explode (batch_to_mongo.py:169-198,
    * stream_join.py:217-228) re-expressed over a generic set of measure
    * columns. Generates rows inline (no shuffle); null measures dropped
    * like the reference drops null prices.
    */
  def unpivot(df: DataFrame, idCols: Seq[String],
              measureCols: Seq[String]): DataFrame = {
    val kvs = array(measureCols.map(m =>
      struct(lit(m).as("measure"), col(m).cast(DoubleType).as("val"))): _*)
    // row-count multiplies by |measures|: spread a single-file input first
    Rebalance(df).select(idCols.map(col) :+ explode(kvs).as("kv"): _*)
      .select(idCols.map(col) :+ col("kv.measure") :+ col("kv.val"): _*)
      .filter(col("val").isNotNull)
  }

  /** J3: left join + fill-zero (EDA bin join, Milestone4 cells 10/20). */
  def leftJoinFillZero(left: DataFrame, right: DataFrame, keys: Seq[String],
                       fillCols: Seq[String]): DataFrame =
    left.join(right, keys, "left").na.fill(0, fillCols)

  /** A7/O3: value_counts + deterministic top-k (sort + limit with an
    * explicit tiebreaker so the row set is stable under any partitioning).
    * Spark plans this as partial count -> shuffle -> TakeOrderedAndProject,
    * i.e. no full sort of the aggregate output.
    */
  def topKByCount(df: DataFrame, keyCol: String, k: Int): DataFrame =
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col(keyCol))
      .limit(k)

  /** U1: union-all of conformed inputs by column name. */
  def unionByName(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_.unionByName(_))

  /** Snapshot diff — the lake-versioning primitive: classify every key
    * as added / removed / changed / unchanged between two snapshots of
    * the same table, comparing an md5 over the named value columns.
    * Values are type-prefixed before hashing ("v"+value, null -> "n") so
    * a NULL can never collide with any literal string — an in-band
    * sentinel like " " would classify NULL vs " " as unchanged. One
    * full-outer shuffle join on the key, content hashes computed
    * map-side — at 100 TB this is the cheapest complete answer; with
    * both snapshots bucketed by the key it degrades to a co-located
    * zipper.
    */
  def snapshotDiff(before: DataFrame, after: DataFrame, keyCol: String,
                   valueCols: Seq[String]): DataFrame = {
    def tagged(df: DataFrame, h: String) = df.select(col(keyCol),
      md5(concat_ws("|", valueCols.map(c =>
        coalesce(concat(lit("v"), col(c).cast("string")), lit("n"))): _*))
        .as(h))
    tagged(before, "_hb").join(tagged(after, "_ha"), Seq(keyCol),
        "full_outer")
      .select(col(keyCol),
        when(col("_hb").isNull, lit("added"))
          .when(col("_ha").isNull, lit("removed"))
          .when(col("_hb") === col("_ha"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** CDC merge — MERGE INTO semantics without a table format: apply a
    * changeset of upserts (`op != "D"`) and deletes (`op == "D"`) to a
    * base snapshot, latest change per key winning by `seqCol` (the
    * Debezium/Delta change-log shape). `changes` must carry the base
    * schema plus `opCol`/`seqCol`; `seqCol` must order changes totally
    * within a key (a log offset / LSN — ties are a malformed log).
    *
    * Plan shape: one groupBy on the key collapses the log to its final
    * change per key (`max_by` struct, map-side partial), then one
    * left-anti join removes superseded base rows and a union appends the
    * surviving upserts. At 100 TB the changeset is the small side — the
    * anti join broadcasts; nothing ever shuffles the base snapshot.
    */
  /** Incremental aggregate maintenance: merge per-key aggregate
    * snapshots (count / sum / min / max columns) instead of recomputing
    * from raw rows — the partial-merge identity that makes count, sum,
    * min and max maintainable under appends. Each input snapshot carries
    * `(keyCols, cntCol, sumCols..., minCols..., maxCols...)`; the output
    * re-merges by key (sum the counts and sums, min the mins, max the
    * maxes). At 100 TB the delta side is a day's partition and the
    * snapshot side is never re-scanned from raw data — the merge
    * touches only aggregate-grain rows.
    */
  def mergeAggSnapshots(snapshots: Seq[DataFrame], keyCols: Seq[String],
                        cntCol: String, sumCols: Seq[String],
                        minCols: Seq[String] = Nil,
                        maxCols: Seq[String] = Nil): DataFrame = {
    val merged = snapshots.reduce(_.unionByName(_))
    val aggs = (sum(col(cntCol)).as(cntCol) +:
      sumCols.map(c => sum(col(c)).as(c))) ++
      minCols.map(c => min(col(c)).as(c)) ++
      maxCols.map(c => max(col(c)).as(c))
    merged.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** @param broadcastChanges forces the anti-join's changeset side to
    *   broadcast. PRECONDITION when true: the per-key collapsed changeset
    *   must fit the driver + every executor (it is collected for the
    *   broadcast) — true for the CDC contract this models (a day's change
    *   log against a full snapshot), catastrophically false if `changes`
    *   is snapshot-scale. The default (false) leaves the join strategy to
    *   Catalyst/AQE, which broadcasts anyway below the autoBroadcast
    *   threshold and degrades to a shuffle join instead of an OOM above
    *   it — the safe posture when the changeset's size is not known.
    */
  def applyChangeSet(base: DataFrame, changes: DataFrame,
                     keyCols: Seq[String], opCol: String = "op",
                     seqCol: String = "seq",
                     broadcastChanges: Boolean = false): DataFrame = {
    val payload = changes.columns
      .filterNot(c => keyCols.contains(c) || c == seqCol)
    val latest = changes.groupBy(keyCols.map(col): _*)
      .agg(max_by(struct(payload.map(col): _*), col(seqCol)).as("_c"))
      .select(keyCols.map(col) ++ payload.map(f => col(s"_c.$f")): _*)
    val keys = latest.select(keyCols.map(col): _*)
    base.join(if (broadcastChanges) broadcast(keys) else keys, keyCols,
        "left_anti")
      .unionByName(latest.filter(col(opCol) =!= "D")
        .select(base.columns.map(col): _*))
  }
}

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
}

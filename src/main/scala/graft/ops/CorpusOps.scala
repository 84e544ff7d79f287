package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-preparation operators for pretraining pipelines (north-star
  * suite): token-budget packing, deterministic content-hash splits, and
  * text normalization. All pure Column algebra / window sums — oracle-
  * checkable and codegen'd.
  */
object CorpusOps {

  /** Pack documents into sequential token-budget chunks per group:
    * `chunk_id = floor(running_token_count_before_doc / budget)` over a
    * total order. One window shuffle per group key; at 100 TB packing
    * runs per (source, date) partition so no global sort is needed.
    * A chunk may overflow by at most one document (greedy sequential
    * packing — the standard pretraining behavior before truncation).
    */
  def tokenBudgetChunks(docs: DataFrame, idCol: String, byCol: String,
                        tokenCol: Column, budget: Int): DataFrame = {
    val w = Window.partitionBy(col(byCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    docs.withColumn("tokens", tokenCol)
      .withColumn("chunk_id",
        floor((sum(col("tokens")).over(w) - col("tokens")) /
          lit(budget.toDouble)).cast("long"))
  }

  /** Deterministic train/val/test split from the content hash — the
    * CCNet-style discipline: membership depends only on the text, so
    * re-runs, resharding, and dedup upstream never move a document across
    * splits. Thresholds compare the first two md5-hex chars
    * lexicographically (256 buckets).
    */
  def deterministicSplit(docs: DataFrame, textCol: String = "text",
                         testUpper: String = "0a",
                         valUpper: String = "14"): DataFrame = {
    val h = substring(md5(col(textCol)), 1, 2)
    docs.withColumn("split",
      when(h < testUpper, "test")
        .when(h < valUpper, "val")
        .otherwise("train"))
  }

  /** Normalization for dedup/analysis: lowercase, strip non-alphanumeric
    * (keeping spaces), collapse whitespace runs, trim.
    */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(c), "[^a-z0-9 ]", " "), " +", " "))
}

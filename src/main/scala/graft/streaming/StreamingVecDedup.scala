package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.SimilarityOps

/** Continuous-ingest embedding near-duplicate filtering against the
  * on-disk IVF index — the vector twin of [[StreamingDedup]].
  *
  * Each micro-batch of new vectors is probed against the indexed corpus
  * ([[SimilarityOps.ivfIndexTopK]] — partition-pruned bucket scans, the
  * probe cost scales with the batch, not the corpus); rows whose best
  * indexed neighbor reaches `minCos` are dropped, within-batch near-dup
  * groups keep the min id (banded sign-LSH candidates + exact cosine
  * verify, [[SimilarityOps.cosineNearDupPairsBucketed]]), and survivors
  * are appended to both the output and the index
  * ([[SimilarityOps.appendIvfIndex]] — the bucket function is stateless,
  * so appends need no quantizer retraining). Batch N+1 deduplicates
  * against batch N's survivors. At-least-once, idempotent per id;
  * periodic [[graft.ops.IndexMaintenance.compactBucketed]] folds the
  * per-batch files.
  *
  * The corpus-side drop decision probes single-bucket (multiProbe=false):
  * a near-dup pair split across a hyperplane boundary is missed — the
  * standard sign-LSH recall trade; probe multiProbe=true for bits+1
  * buckets per query if the boundary loss matters more than scan cost.
  */
object StreamingVecDedup {

  /** `compactEvery` > 0: same in-loop incremental maintenance cadence as
    * [[StreamingDedup.run]] — every `compactEvery`-th micro-batch folds
    * the delta into a new base generation, rewriting only the touched
    * buckets ([[graft.ops.IndexMaintenance.compactBucketedIncremental]]).
    */
  def run(spark: SparkSession, vecStream: DataFrame, indexPath: String,
          outPath: String, checkpoint: String, dim: Int, bits: Int,
          minCos: Double = 0.995, idCol: String = "vec_id",
          vecCol: String = "embedding",
          trigger: Trigger = Trigger.AvailableNow(),
          compactEvery: Int = 0): StreamingQuery =
    vecStream.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val b = batch.persist()
        try {
          val survivors = dedupBatch(spark, b, indexPath, dim, bits,
            minCos, idCol, vecCol).persist()
          try {
            survivors.write.mode("append").parquet(outPath)
            SimilarityOps.appendIvfIndex(survivors, indexPath, dim, bits,
              idCol, vecCol)
          } finally survivors.unpersist(blocking = true)
        } finally b.unpersist(blocking = true)
        // best-effort maintenance — see StreamingDedup.run: a failed
        // fold must not fail a batch whose sink/append work committed
        if (compactEvery > 0 && batchId % compactEvery == compactEvery - 1)
          try SimilarityOps.compactIvfIndexIncremental(spark, indexPath,
            idCol)
          catch {
            case scala.util.control.NonFatal(e) =>
              System.err.println("[StreamingVecDedup] in-loop compaction" +
                s" failed for batch $batchId (delta retained): $e")
          }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** One batch's survivors: drop vectors whose nearest indexed neighbor
    * reaches `minCos`, then keep the min-id representative of each
    * within-batch near-dup group. Exposed for batch-mode reuse and
    * testing.
    */
  def dedupBatch(spark: SparkSession, batch: DataFrame, indexPath: String,
                 dim: Int, bits: Int, minCos: Double,
                 idCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame = {
    val dupVsCorpus = SimilarityOps
      .ivfIndexTopK(spark, indexPath, batch, k = 1, dim, bits,
        idCol = idCol, vecCol = vecCol)
      .filter(col("cos_sim") >= minCos)
      .select(col("query_id").as(idCol))
    val dupInBatch = SimilarityOps
      .cosineNearDupPairsBucketed(batch, threshold = minCos, dim = dim,
        idCol = idCol, vecCol = vecCol)
      .select(col("id_b").as(idCol))
    batch.join(dupVsCorpus.union(dupInBatch), Seq(idCol), "left_anti")
  }
}

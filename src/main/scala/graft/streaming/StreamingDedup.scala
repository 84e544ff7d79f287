package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.DedupOps

/** Continuous-ingest near-duplicate filtering against the on-disk MinHash
  * index — the streaming face of [[graft.ops.DedupOps.minhashIndexProbe]].
  *
  * Each micro-batch of new documents is
  *   1. probed against the indexed corpus (partition-pruned bucket scans +
  *      a broadcast of the batch's own band rows — the corpus text is never
  *      re-read, only the bucket directories the batch's hashes name),
  *   2. self-checked for within-batch near-dups (min-id representative
  *      survives), and
  *   3. survivors are appended to `outPath` while their band rows extend
  *      the index, so batch N+1 deduplicates against batch N's survivors.
  *
  * Probe cost scales with the MICRO-BATCH, not the corpus — the shape that
  * holds when the indexed corpus is 100 TB and the ingest is a trickle.
  * Each batch appends ONE flat file to the index's L0 delta
  * ([[graft.ops.DedupOps.appendMinhashIndexBands]]); probes union the
  * delta in, and periodic [[graft.ops.DedupOps.compactMinhashIndex]]
  * folds it into the bucketed base — the classic LSM contract
  * ([[graft.ops.IndexMaintenance]] scaladoc).
  *
  * Delivery: at-least-once. A replayed batch re-appends the same survivor
  * rows and band rows (both keyed by doc_id), so downstream consumers
  * dedupe exactly by id — the same contract as the reference's replayed
  * blob ingestion (batch_to_mongo.py processed-state replay).
  *
  * The index must be bootstrapped with a non-empty corpus first (an empty
  * parquet write carries no `bucket` partition column, so the probe's
  * partition filter would not resolve).
  */
object StreamingDedup {

  /** `compactEvery` > 0 runs the in-loop maintenance cadence: after
    * every `compactEvery`-th micro-batch (by batchId, so replays stay
    * deterministic) the delta folds into a new base generation via
    * [[graft.ops.IndexMaintenance.compactBucketedIncremental]] — only
    * the buckets the accumulated deltas touched rewrite, untouched
    * buckets transfer by link, and the manifest flip is atomic, so the
    * L0 delta never grows past `compactEvery` batches of files and
    * probe cost stays batch-proportional without any external
    * maintenance job. 0 (the default) keeps maintenance external.
    */
  def run(spark: SparkSession, docsStream: DataFrame, indexPath: String,
          outPath: String, checkpoint: String, idCol: String = "doc_id",
          textCol: String = "text", shingleWords: Int = 3, k: Int = 16,
          bands: Int = 4, minBands: Int = 1,
          trigger: Trigger = Trigger.AvailableNow(),
          compactEvery: Int = 0): StreamingQuery =
    docsStream.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        // one signature pass per batch: the banded frame feeds the index
        // probe (bucket collect + broadcast side) AND the in-batch
        // self-join; the raw batch feeds the final anti-join; survivors
        // feed sink + index append. All three persist for the batch's
        // scope and release before the next batch.
        val b = batch.persist()
        val banded = DedupOps.minhashBands(b, idCol, textCol,
          shingleWords, k, bands).persist()
        try {
          val survivors = survivorsOf(spark, b, banded, indexPath, idCol,
            minBands).persist()
          try {
            survivors.write.mode("append").parquet(outPath)
            // index append reuses the batch's banded signatures (semi-join
            // on survivor ids) — the kernel already ran once for the
            // probe/self-check; re-deriving signatures from survivor text
            // here would double the batch's CPU cost
            DedupOps.appendMinhashIndexBands(
              banded.join(survivors.select(col(idCol)), Seq(idCol),
                "left_semi"),
              indexPath)
          } finally survivors.unpersist(blocking = true)
        } finally {
          banded.unpersist(blocking = true)
          b.unpersist(blocking = true)
        }
        // maintenance is BEST-EFFORT: the batch's real work (sink +
        // index append) already committed, so a maintenance failure
        // (e.g. losing the manifest race to a sanctioned external
        // compaction) must not fail the batch — a failed batch replays
        // and re-appends the survivors to the sink. The delta simply
        // waits for the next cadence tick.
        if (compactEvery > 0 && batchId % compactEvery == compactEvery - 1)
          try DedupOps.compactMinhashIndexIncremental(spark, indexPath,
            idCol)
          catch {
            case scala.util.control.NonFatal(e) =>
              System.err.println("[StreamingDedup] in-loop compaction " +
                s"failed for batch $batchId (delta retained): $e")
          }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** One batch's survivors: drop docs near-duplicating the indexed corpus,
    * then keep only the min-id representative of each within-batch
    * candidate group. Exposed for batch-mode reuse and testing; computes
    * the banded signatures unpersisted — the streaming loop above manages
    * the persist lifecycle itself via [[survivorsOf]].
    */
  def dedupBatch(spark: SparkSession, batch: DataFrame, indexPath: String,
                 idCol: String = "doc_id", textCol: String = "text",
                 shingleWords: Int = 3, k: Int = 16, bands: Int = 4,
                 minBands: Int = 1): DataFrame =
    survivorsOf(spark, batch,
      DedupOps.minhashBands(batch, idCol, textCol, shingleWords, k, bands),
      indexPath, idCol, minBands)

  private def survivorsOf(spark: SparkSession, batch: DataFrame,
                          banded: DataFrame, indexPath: String,
                          idCol: String, minBands: Int): DataFrame = {
    val dupVsCorpus = DedupOps
      .minhashIndexProbeBands(spark, indexPath, banded, idCol)
      .filter(col("n_shared_bands") >= minBands)
      .select(col("doc_new").as(idCol))
    val dupInBatch = DedupOps
      .minhashCandidatesBands(banded, idCol)
      .filter(col("n_shared_bands") >= minBands)
      .select(col("doc_b").as(idCol))
    // one anti-join against the unioned drop set (anti-join semantics
    // don't need the distinct)
    batch.join(dupVsCorpus.union(dupInBatch), Seq(idCol), "left_anti")
  }
}

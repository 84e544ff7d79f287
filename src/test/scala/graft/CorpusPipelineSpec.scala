package graft

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{CorpusOps, DedupOps, TextOps}

/** End-to-end training-data pipeline over the real documents table:
  * normalize -> PII scrub -> quality filter -> exact dedup -> LM score
  * -> deterministic split -> token-budget pack. The per-op specs cover
  * semantics; this one proves the ops COMPOSE — output invariants hold
  * across the chained pipeline on real testdata, the way a user would
  * actually run the library.
  */
class CorpusPipelineSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("normalize -> scrub -> filter -> dedup -> split -> pack composes") {
    val docs = Tables.documents(spark, sfDir)

    // 1. normalize + scrub (narrow projections)
    val cleaned = TextOps.piiScrub(docs)
      .withColumn("text", CorpusOps.normalizeText(col("text_scrubbed")))
      .select("doc_id", "lang", "source", "text")

    // 2. quality gate (keep mid-band docs)
    val scored = TextOps.qualityScore(cleaned)
    val kept = scored.filter(col("quality_score") >= 0.3)
      .select("doc_id", "lang", "source", "text")
    val nKept = kept.count()
    assert(nKept > 0 && nKept <= docs.count())

    // 3. exact dedup: survivors only
    val survivors = DedupOps.exactDuplicateGroups(kept)
      .select(col("keep_id").as("doc_id"))
    val deduped = kept.join(survivors, Seq("doc_id"), "left_semi")
    // no two surviving docs share a text
    val dupCheck = deduped.groupBy(col("text")).count()
      .filter(col("count") > 1).count()
    assert(dupCheck === 0L, "dedup left identical texts behind")

    // 4. LM quality score still computable post-dedup (vocab rebuilt on
    // the surviving corpus), every doc scored
    val lm = TextOps.unigramLogProb(deduped, topV = 50)
    assert(lm.count() === deduped.count())
    assert(lm.filter(col("avg_logprob").isNull).count() === 0L)

    // 5. deterministic split: partition of the survivors, content-stable
    val split = CorpusOps.deterministicSplit(deduped)
    assert(split.count() === deduped.count())
    val bySplit = split.groupBy(col("split")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    assert(bySplit.getOrElse("train", 0L) > 0L)
    // membership depends only on content: re-splitting a shuffled copy
    // agrees doc by doc
    val resplit = CorpusOps.deterministicSplit(
      deduped.orderBy(col("text"))).select(col("doc_id"),
        col("split").as("split2"))
    assert(split.join(resplit, "doc_id")
      .filter(col("split") =!= col("split2")).count() === 0L)

    // 6. pack the train split into token-budget chunks per language
    val budget = 512
    val train = split.filter(col("split") === "train")
    val packed = CorpusOps.tokenBudgetChunks(
      train, "doc_id", "lang",
      size(org.apache.spark.sql.functions.split(col("text"), " ")), budget)
    assert(packed.count() === train.count())
    // every chunk except each language's last stays under budget +
    // one-doc overflow (greedy sequential packing contract)
    val chunkSums = packed.groupBy(col("lang"), col("chunk_id"))
      .agg(sum(col("tokens")).as("chunk_tokens"),
        max(col("tokens")).as("max_doc"))
      .collect()
    chunkSums.foreach { r =>
      // tokens is LONG by contract (tokenBudgetChunks casts, mirroring
      // packSequences), so max(tokens) comes back long
      val total = r.getLong(2); val maxDoc = r.getLong(3)
      assert(total <= budget + maxDoc,
        s"chunk ${r.get(0)}/${r.get(1)} over budget: $total")
    }
    // chunk ids are dense from 0 per language
    val perLang = packed.groupBy(col("lang"))
      .agg(min(col("chunk_id")).as("lo"),
        countDistinct(col("chunk_id")).as("n"),
        max(col("chunk_id")).as("hi")).collect()
    perLang.foreach { r =>
      assert(r.getLong(1) === 0L)
      assert(r.getLong(3) === r.getLong(2) - 1)
    }
  }
}

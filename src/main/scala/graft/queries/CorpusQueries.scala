package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.CorpusOps
import Catalog.Entry

/** Corpus-preparation suite (north-star): packing, splits, normalization. */
object CorpusQueries {

  def defs: Map[String, Entry] = Map(

    // Token-budget packing: whitespace-token counts, sequential 512-token
    // chunks per source.
    "corpus_chunk_pack" -> Entry(
      (s, dir) => CorpusOps.tokenBudgetChunks(
          Tables.documents(s, dir), "doc_id", "source",
          size(split(col("text"), " ")).cast("long"), budget = 512)
        .select(col("doc_id"), col("source"), col("tokens"),
          col("chunk_id")),
      Some("""
        SELECT doc_id, source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens,
               CAST(floor((sum(len(string_split(text, ' ')))
                 OVER (PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - len(string_split(text, ' '))) / 512.0) AS BIGINT)
                 AS chunk_id
        FROM documents""")),

    // Sliding-window chunking with overlap (seq-len 256, stride 128):
    // the long-document splitter; tail windows may be short.
    "corpus_window_chunks" -> Entry(
      (s, dir) => CorpusOps.windowChunks(Tables.documents(s, dir),
        "doc_id", "text", size = 256, stride = 128),
      Some("""
        SELECT doc_id, CAST(s / 128 AS BIGINT) AS chunk_id,
               substr(text, CAST(s AS INTEGER) + 1, 256) AS chunk
        FROM documents,
             UNNEST(generate_series(0, length(text) - 1, 128)) AS t(s)
        WHERE length(text) > 0""")),

    // Deterministic content-hash split (membership depends only on text).
    "corpus_det_split" -> Entry(
      (s, dir) => CorpusOps.deterministicSplit(Tables.documents(s, dir))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          round(sum(col("n_chars")).cast("double"), 2).as("total_chars")),
      Some("""
        SELECT CASE WHEN substring(md5(text), 1, 2) < '0a' THEN 'test'
                    WHEN substring(md5(text), 1, 2) < '14' THEN 'val'
                    ELSE 'train' END AS split,
               count(*) AS n_docs,
               round(CAST(sum(n_chars) AS DOUBLE), 2) AS total_chars
        FROM documents GROUP BY 1""")),

    // Term document-frequency stats — the inverted-index/IDF surface a
    // corpus pipeline maintains: distinct (doc, term) explode, per-term
    // doc counts + total occurrences, top 20 by df with term tiebreak.
    "corpus_term_df" -> Entry(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val terms = docs.select(col("doc_id"),
          explode(split(col("text"), " ")).as("term"))
        val df_ = terms.groupBy(col("term"))
          .agg(countDistinct(col("doc_id")).as("doc_freq"),
            count(lit(1)).as("total_occurrences"))
        df_.orderBy(col("doc_freq").desc, col("term")).limit(20)
      },
      Some("""
        SELECT term, doc_freq, total_occurrences FROM (
          SELECT term, count(DISTINCT doc_id) AS doc_freq,
                 count(*) AS total_occurrences
          FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                FROM documents)
          GROUP BY 1)
        ORDER BY doc_freq DESC, term LIMIT 20""")),

    // Normalization: engine-portable via the md5 of the normalized text.
    "corpus_normalize" -> Entry(
      (s, dir) => Tables.documents(s, dir)
        .select(col("doc_id"),
          md5(CorpusOps.normalizeText(col("text"))).as("norm_md5"),
          length(CorpusOps.normalizeText(col("text"))).cast("long")
            .as("norm_len")),
      Some("""
        SELECT doc_id,
               md5(trim(regexp_replace(regexp_replace(lower(text),
                 '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS norm_md5,
               length(trim(regexp_replace(regexp_replace(lower(text),
                 '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS norm_len
        FROM documents"""))
  )
}

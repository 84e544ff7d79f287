package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{RetrievalOps, SimilarityOps}
import Catalog.Entry

/** Retrieval surface: BM25 lexical top-k and hybrid lexical+semantic
  * fusion (north-star training-data ops — corpus mining / example
  * selection). Generalizes the reference's bag-of-words statistics
  * (Milestone4 cells 9/15) into corpus-scale ranking operators.
  *
  * Oracle notes: tf/df/dl are exact integer counts in both engines; `ln`
  * is rounded to 6 before use; all remaining double algebra is written in
  * the identical operation order (literals interpolated from the same
  * Scala doubles, which round-trip through their decimal repr).
  */
object RetrievalQueries {

  private val terms = Seq("hash", "merge", "vector")
  private val k1 = 1.2
  private val b = 0.75

  /** DuckDB twin of RetrievalOps.bm25Scored over `documents`, as a CTE
    * chain ending in a `scored(doc_id, bm25)` relation.
    */
  private def bm25Cte: String = {
    val ts = terms.distinct.sorted
    val tfCols = ts.map(t =>
      s"CAST(len(regexp_extract_all(lower(text), '\\b$t\\b')) AS DOUBLE) AS tf_$t")
      .mkString(",\n                 ")
    val dfCols = ts.map(t =>
      s"CAST(sum(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_$t")
      .mkString(",\n                 ")
    val contribs = ts.map { t =>
      s"""round(ln(1.0 + (n_docs - df_$t + 0.5) / (df_$t + 0.5)), 6)
           * (tf_$t * ${k1 + 1.0} / (tf_$t + $k1
              * (${1.0 - b} + $b * dl / (sum_dl / n_docs))))"""
    }.mkString(" + ")
    s"""
        base AS (
          SELECT doc_id,
                 CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl,
                 $tfCols
          FROM documents),
        stats AS (
          SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                 CAST(sum(dl) AS DOUBLE) AS sum_dl,
                 $dfCols
          FROM base),
        scored AS (
          SELECT doc_id, round($contribs, 4) AS bm25
          FROM base, stats)"""
  }

  def defs: Map[String, Entry] = Map(

    // North-star retrieval: BM25 top-k over the corpus (single-scan
    // scoring against a broadcast one-row statistics reduce).
    "bm25_topk" -> Entry(
      (s, dir) => RetrievalOps.bm25TopK(
        Tables.documents(s, dir), terms, 15)
        .select(col("doc_id"), col("bm25"), col("rnk")),
      Some(s"""
        WITH $bm25Cte
        SELECT doc_id, bm25,
               CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id)
                 AS INTEGER) AS rnk
        FROM scored ORDER BY bm25 DESC, doc_id LIMIT 15""")),

    // North-star hybrid search: RRF fusion of the BM25 top-100 and the
    // embedding-cosine top-100 (query vector = vec 0), k_rrf = 60.
    // Fusion happens over bounded candidate lists — the scale contract.
    "hybrid_rrf" -> Entry(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val lex = RetrievalOps.bm25TopK(docs, terms, 100)
          .select(col("doc_id").as("id"), col("rnk"))
        val emb = Tables.embeddings(s, dir)
        val cand = emb.join(
          docs.select(col("doc_id").as("vec_id")), Seq("vec_id"),
          "left_semi")
        val qv = emb.filter(col("vec_id") === 0)
          .select(col("embedding").as("qv"))
        val sem0 = cand.crossJoin(broadcast(qv))
          .select(col("vec_id").as("id"),
            SimilarityOps.cosine(col("embedding"), col("qv")).as("cos"))
          .orderBy(col("cos").desc, col("id")).limit(100)
        val sem = sem0.withColumn("rnk",
          row_number().over(Window.orderBy(col("cos").desc, col("id"))))
          .select(col("id"), col("rnk"))
        RetrievalOps.rrfFuse(Seq("lex" -> lex, "sem" -> sem), 60)
          .orderBy(col("rrf_score").desc, col("id")).limit(20)
          .select(col("id"), col("rrf_score"), col("rnk_lex"),
            col("rnk_sem"))
      },
      Some(s"""
        WITH $bm25Cte,
        lex AS (
          SELECT doc_id AS id,
                 CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id)
                   AS INTEGER) AS rnk
          FROM scored ORDER BY bm25 DESC, doc_id LIMIT 100),
        cand AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
          FROM embeddings
          WHERE vec_id IN (SELECT doc_id FROM documents)),
        qv AS (SELECT CAST(embedding AS DOUBLE[]) AS q
               FROM embeddings WHERE vec_id = 0),
        semscore AS (
          SELECT vec_id AS id,
                 list_dot_product(e, q) /
                   (sqrt(list_dot_product(e, e)) *
                    sqrt(list_dot_product(q, q))) AS cos
          FROM cand, qv),
        sem AS (
          SELECT id, CAST(row_number() OVER (ORDER BY cos DESC, id)
                   AS INTEGER) AS rnk
          FROM semscore ORDER BY cos DESC, id LIMIT 100),
        fused AS (
          SELECT coalesce(lex.id, sem.id) AS id,
                 round(coalesce(1.0 / (60.0 + lex.rnk), 0.0)
                     + coalesce(1.0 / (60.0 + sem.rnk), 0.0), 6)
                   AS rrf_score,
                 lex.rnk AS rnk_lex, sem.rnk AS rnk_sem
          FROM lex FULL OUTER JOIN sem ON lex.id = sem.id)
        SELECT id, rrf_score, rnk_lex, rnk_sem
        FROM fused ORDER BY rrf_score DESC, id LIMIT 20"""))
  )
}

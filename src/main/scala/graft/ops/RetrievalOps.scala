package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lexical retrieval and rank fusion over the document corpus — the
  * query-side ops a training-data pipeline needs next to dedup/similarity
  * (mining domain-relevant documents, hybrid lexical+semantic selection).
  *
  * The reference's text surface stops at per-doc features
  * (Milestone4 cell 9) and TF-IDF-as-model-input (cell 15,
  * `eda/...Milestone4.ipynb`); BM25/RRF generalize that same
  * bag-of-words statistics stack into corpus-scale retrieval operators.
  *
  * Scale shape: corpus statistics (N, Σdl, per-term df) reduce to ONE row
  * — broadcast back across the corpus, so scoring is a single scan with
  * map-side-only work, and top-k is Spark's TakeOrdered (per-partition
  * heaps + driver merge of k). Nothing here shuffles the corpus.
  *
  * Determinism policy (oracle parity): tf/df/dl/N are exact integers; the
  * only transcendental (`ln` in idf) is rounded to 6 before use; the
  * remaining double algebra is written in the identical operation order as
  * the DuckDB twin, so scores hash-match. Rankings order by the ROUNDED
  * score with id tiebreaks.
  */
object RetrievalOps {

  /** Per-term within-doc frequency: word-boundary regex count over the
    * lowercased text (same counting primitive as TextOps.languageId).
    * The term is regex-quoted so metacharacters ("c++", "a.b") count
    * literally instead of throwing or mis-matching.
    */
  private def tf(textLower: Column, term: String): Column = {
    // \b is anchored to word chars: wrapping a term whose edge is a
    // NON-word char (e.g. "c++") in \b...\b can never match. Only emit a
    // boundary on edges where \b is well-defined; non-word edges use a
    // negative lookaround instead. The edge test MUST use the same
    // definition of "word char" as the regex engine's \b/\w — ASCII
    // [a-zA-Z0-9_] — or a term edged by a non-ASCII letter ("école")
    // would be classified word-edged, wrapped in \b, and never match
    // next to its own non-ASCII word characters.
    def word(c: Char) =
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '_'
    val pre = if (term.nonEmpty && word(term.head)) "\\b" else "(?<!\\w)"
    val suf = if (term.nonEmpty && word(term.last)) "\\b" else "(?!\\w)"
    size(regexp_extract_all(textLower,
      lit(pre + java.util.regex.Pattern.quote(term) + suf), lit(0)))
      .cast("double")
  }

  /** BM25 (Robertson/Sparck Jones; the `ln(1 + (N-df+0.5)/(df+0.5))`
    * non-negative idf variant) of every document against a bag of query
    * terms. Output: idCol, dl, bm25 (rounded to 4).
    *
    * Two passes over the corpus: one to reduce the statistics row, one to
    * score — both full scans with no shuffle (the stats row is a broadcast
    * cross join).
    */
  def bm25Scored(docs: DataFrame, terms: Seq[String],
                 k1: Double = 1.2, b: Double = 0.75,
                 idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    val ts = terms.distinct.sorted
    // internal tf/df columns are keyed by term INDEX, not the term text —
    // a term containing '.', '`', or other attribute syntax must never
    // reach col() name resolution
    val ti = ts.indices
    val base = docs.select(
      col(idCol) +:
        size(split(col(textCol), " ")).cast("double").as("dl") +:
        ti.map(i => tf(lower(col(textCol)), ts(i)).as(s"tf_$i")): _*)
    val stats = base.agg(
      count(lit(1)).cast("double").as("n_docs"),
      sum(col("dl")).cast("double").as("sum_dl") +:
        ti.map(i =>
          sum((col(s"tf_$i") > 0).cast("long")).cast("double")
            .as(s"df_$i")): _*)
    val withStats = base.crossJoin(broadcast(stats))
      .withColumn("avg_dl", col("sum_dl") / col("n_docs"))
    def idf(i: Int): Column =
      round(log(lit(1.0) + (col("n_docs") - col(s"df_$i") + lit(0.5)) /
        (col(s"df_$i") + lit(0.5))), 6)
    def contrib(i: Int): Column =
      idf(i) * (col(s"tf_$i") * lit(k1 + 1.0) /
        (col(s"tf_$i") + lit(k1) *
          (lit(1.0 - b) + lit(b) * col("dl") / col("avg_dl"))))
    withStats.select(col(idCol), col("dl"),
      round(ti.map(contrib).reduce(_ + _), 4).as("bm25"))
  }

  /** Top-k BM25 retrieval: rank by (bm25 desc, id) — ties broken on the
    * rounded score, so the cut is engine-portable. Output adds `rnk`.
    */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75,
               idCol: String = "doc_id",
               textCol: String = "text"): DataFrame = {
    val scored = bm25Scored(docs, terms, k1, b, idCol, textCol)
      .orderBy(col("bm25").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("bm25"))
    // k rows on one partition post-limit: the global window is free here
    scored.withColumn("rnk", row_number().over(
      org.apache.spark.sql.expressions.Window
        .orderBy(col("bm25").desc, col(idCol))))
  }

  /** Reciprocal-rank fusion (Cormack et al., SIGIR'09) of bounded ranked
    * lists: rrf(d) = Σ_lists 1/(kRrf + rank_list(d)), absent-from-list
    * contributes 0.
    *
    * Each input is (idCol, rnk) — ALREADY truncated to its top-N (that is
    * the scale contract: fusion joins candidate lists of bounded size,
    * never whole-corpus rankings). Lists are folded with full-outer joins
    * in the given order so the floating-point sum order is deterministic;
    * per-list ranks survive as `rnk_<name>` columns.
    */
  def rrfFuse(lists: Seq[(String, DataFrame)], kRrf: Int = 60,
              idCol: String = "id"): DataFrame = {
    require(lists.nonEmpty, "rrfFuse: need at least one ranked list")
    val renamed = lists.map { case (name, df) =>
      name -> df.select(col(df.columns.head).as(idCol),
        col("rnk").as(s"rnk_$name"))
    }
    val joined = renamed.map(_._2)
      .reduce((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val score = renamed.map { case (name, _) =>
      coalesce(lit(1.0) / (lit(kRrf.toDouble) + col(s"rnk_$name")),
        lit(0.0))
    }.reduce(_ + _)
    joined.select(
      col(idCol) +: round(score, 6).as("rrf_score") +:
        renamed.map { case (name, _) => col(s"rnk_$name") }: _*)
  }
}

package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.TextOps
import Catalog.Entry

/** Text features, sentiment algebra, and the training-data text-analysis
  * suite (SURVEY.md §2.9 F9-F12, §2.11 X1/X7; north-star language-ID /
  * quality / token-count / fingerprint ops).
  */
object TextQueries {

  def defs: Map[String, Entry] = Map(

    // F9-F12 / X7: basic text features (Milestone4 cell 9
    // `basic_text_features`).
    "x7_text_features" -> Entry(
      (s, dir) => TextOps.basicTextFeatures(Tables.documents(s, dir))
        .select(col("doc_id"), col("text_len").cast("long").as("text_len"),
          col("n_words").cast("long").as("n_words"),
          col("n_urls").cast("long").as("n_urls"),
          col("n_mentions").cast("long").as("n_mentions"),
          col("n_hashtags").cast("long").as("n_hashtags"),
          col("n_cashtags").cast("long").as("n_cashtags"),
          col("has_number"), col("has_cta")),
      Some("""
        SELECT doc_id,
               length(text) AS text_len,
               len(string_split(text, ' ')) AS n_words,
               len(regexp_extract_all(text, 'http[s]?://|t\.co/')) AS n_urls,
               len(regexp_extract_all(text, '@\w+')) AS n_mentions,
               len(regexp_extract_all(text, '#\w+')) AS n_hashtags,
               len(regexp_extract_all(text, '\$\w+')) AS n_cashtags,
               len(regexp_extract_all(text, '\b\d+(\.\d+)?\b')) > 0
                 AS has_number,
               len(regexp_extract_all(lower(text),
                 'buy|sell|join|subscribe|click')) > 0 AS has_cta
        FROM documents""")),

    // X1 + P12: sentiment score->label->signal algebra
    // (stream_join.py:231-346; lexicon swap documented in TextOps).
    "x1_sentiment" -> Entry(
      (s, dir) => TextOps.sentiment(Tables.documents(s, dir))
        .select(col("doc_id"), col("sentiment_score"),
          col("sentiment_magnitude"), col("sentiment_label"),
          col("action_signal")),
      Some("""
        WITH scored AS (
          SELECT doc_id,
            CAST(len(regexp_extract_all(substring(lower(text), 1, 10000),
              '\bfast\b')) + len(regexp_extract_all(substring(lower(text),
              1, 10000), '\bbig\b')) AS DOUBLE) AS pos,
            CAST(len(regexp_extract_all(substring(lower(text), 1, 10000),
              '\bslow\b')) + len(regexp_extract_all(substring(lower(text),
              1, 10000), '\bsmall\b')) AS DOUBLE) AS neg,
            length(text) > 0 AS nonempty
          FROM documents),
        norm AS (
          SELECT doc_id, nonempty,
            CASE WHEN pos + neg > 0 THEN pos / (pos + neg) ELSE 0.5 END
              AS posn,
            CASE WHEN pos + neg > 0 THEN neg / (pos + neg) ELSE 0.5 END
              AS negn
          FROM scored)
        SELECT doc_id,
          CASE WHEN nonempty THEN posn - negn END AS sentiment_score,
          CASE WHEN nonempty THEN posn + negn END AS sentiment_magnitude,
          CASE WHEN NOT nonempty THEN NULL
               WHEN posn - negn > 0.1 THEN 'POSITIVE'
               WHEN posn - negn < -0.1 THEN 'NEGATIVE'
               ELSE 'NEUTRAL' END AS sentiment_label,
          CASE WHEN NOT nonempty THEN NULL
               WHEN posn - negn > 0 THEN 'buy' ELSE 'sell' END
            AS action_signal
        FROM norm""")),

    // North-star: n-gram/stopword language ID heuristic.
    "lang_id" -> Entry(
      (s, dir) => TextOps.languageId(Tables.documents(s, dir))
        .select(col("doc_id"), col("lang"), col("lang_pred"),
          col("lang_score").cast("long").as("lang_score")),
      Some {
        val scoreSql = TextOps.langMarkers.toSeq.sortBy(_._1).map {
          case (lang, ws) =>
            ws.map(w => s"len(regexp_extract_all(lower(text), '\\b$w\\b'))")
              .mkString(" + ") + s" AS s_$lang"
        }.mkString(",\n            ")
        val langs = TextOps.langMarkers.keys.toSeq.sorted
        val best = langs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
        val caseChain = langs.map(l =>
          s"WHEN s_$l = $best THEN '$l'").mkString(" ")
        s"""
        WITH scored AS (
          SELECT doc_id, lang,
            $scoreSql
          FROM documents)
        SELECT doc_id, lang,
               CASE $caseChain END AS lang_pred,
               CAST($best AS BIGINT) AS lang_score
        FROM scored"""
      }),

    // North-star: pretraining-corpus quality heuristics.
    "quality_score" -> Entry(
      (s, dir) => TextOps.qualityScore(Tables.documents(s, dir))
        .select(col("doc_id"), col("n_words"), col("punct_ratio"),
          col("stopword_ratio"), col("quality_score")),
      Some("""
        WITH f AS (
          SELECT doc_id,
            CAST(length(text) AS DOUBLE) AS nc,
            CAST(len(string_split(text, ' ')) AS DOUBLE) AS nw,
            CAST(len(regexp_extract_all(text, '[\.,;:!\?]')) AS DOUBLE)
              AS np,
            CAST(len(regexp_extract_all(lower(text),
              '\b(the|a|of|and|to|in|is)\b')) AS DOUBLE) AS ns
          FROM documents)
        SELECT doc_id,
               CAST(nw AS BIGINT) AS n_words,
               np / greatest(nc, 1.0) AS punct_ratio,
               ns / greatest(nw, 1.0) AS stopword_ratio,
               (CASE WHEN nc >= 50 AND nc <= 10000 THEN 1.0 ELSE 0.0 END
                + CASE WHEN nc / greatest(nw, 1.0) >= 2
                        AND nc / greatest(nw, 1.0) <= 12
                       THEN 1.0 ELSE 0.0 END
                + least(ns / greatest(nw, 1.0) * 4, 1.0)
                + (1.0 - least(np / greatest(nc, 1.0) * 10, 1.0))) / 4
                 AS quality_score
        FROM f""")),

    // North-star: whitespace + BPE-ish token counting.
    // North-star: C4-style PII redaction with audit counts. DuckDB's
    // regexp_replace needs the 'g' flag to match Spark's replace-all.
    "corpus_pii_scrub" -> Entry(
      (s, dir) => TextOps.piiScrub(Tables.documents(s, dir))
        .select(col("doc_id"),
          col("n_emails").cast("long").as("n_emails"),
          col("n_phones").cast("long").as("n_phones"),
          col("text_scrubbed")),
      Some(s"""
        SELECT doc_id,
               len(regexp_extract_all(text, '${TextOps.emailRe}'))
                 AS n_emails,
               len(regexp_extract_all(text, '${TextOps.phoneRe}'))
                 AS n_phones,
               regexp_replace(regexp_replace(regexp_replace(text,
                 '${TextOps.emailRe}', '<EMAIL>', 'g'),
                 '${TextOps.phoneRe}', '<PHONE>', 'g'),
                 '${TextOps.longNumRe}', '<NUM>', 'g') AS text_scrubbed
        FROM documents""")),

    // Feature-hashing vectorizer: the deterministic documents->vectors
    // bridge (HashingTF semantics on the portable md5-prefix hash),
    // long-form sparse output. tf and sum(tf^2) are integer-exact on
    // both engines; weights round 6.
    "text_hash_embed" -> Entry(
      (s, dir) => TextOps.hashEmbed(Tables.documents(s, dir), dim = 64),
      Some("""
        WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                   FROM documents),
        ft AS (SELECT doc_id,
                      CAST(('0x' || substr(md5(tok), 1, 8))::UBIGINT % 64
                        AS BIGINT) AS dim_idx,
                      count(*) AS tf
               FROM t WHERE tok <> '' GROUP BY 1, 2),
        n AS (SELECT doc_id, sqrt(CAST(sum(tf * tf) AS DOUBLE)) AS nrm
              FROM ft GROUP BY 1)
        SELECT ft.doc_id, ft.dim_idx, round(tf / nrm, 6) AS weight
        FROM ft JOIN n USING (doc_id)""")),

    // IDF-weighted twin (sklearn smooth idf over the hash buckets):
    // tf*idf quantizes to 1e-6 longs before the norm, so the per-doc sum
    // of squares stays integer-exact and weights hash-match.
    "text_hash_tfidf" -> Entry(
      (s, dir) => TextOps.hashTfIdf(Tables.documents(s, dir), dim = 64),
      Some("""
        WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                   FROM documents),
        ft AS (SELECT doc_id,
                      CAST(('0x' || substr(md5(tok), 1, 8))::UBIGINT % 64
                        AS BIGINT) AS dim_idx,
                      count(*) AS tf
               FROM t WHERE tok <> '' GROUP BY 1, 2),
        dfb AS (SELECT dim_idx, count(*) AS df FROM ft GROUP BY 1),
        nn AS (SELECT count(DISTINCT doc_id) AS n FROM ft),
        qv AS (SELECT ft.doc_id, ft.dim_idx,
                      CAST(round(tf * (ln((1.0 + n) / (1.0 + df)) + 1.0)
                        * 1000000.0) AS BIGINT) AS q
               FROM ft JOIN dfb USING (dim_idx) CROSS JOIN nn),
        nrm AS (SELECT doc_id, sqrt(CAST(sum(q * q) AS DOUBLE)) AS nrm
                FROM qv GROUP BY 1)
        SELECT qv.doc_id, qv.dim_idx, round(q / nrm, 6) AS weight
        FROM qv JOIN nrm USING (doc_id)""")),

    "token_counts" -> Entry(
      (s, dir) => TextOps.tokenCounts(Tables.documents(s, dir))
        .select(col("doc_id"),
          col("ws_tokens").cast("long").as("ws_tokens"),
          col("bpe_ish_tokens").cast("long").as("bpe_ish_tokens")),
      Some("""
        SELECT doc_id,
               len(regexp_split_to_array(text, '\s+')) AS ws_tokens,
               len(regexp_extract_all(text,
                 '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS bpe_ish_tokens
        FROM documents""")),

    // North-star: unigram LM log-prob scoring (perplexity-style quality
    // signal). Per-token log-probs quantize to 1e-6 longs BEFORE the
    // per-doc sum, so summation order cannot perturb the result and the
    // oracle's join-based scoring matches the engine's map-literal fold.
    "lm_logprob" -> Entry(
      (s, dir) => TextOps.unigramLogProb(Tables.documents(s, dir), 20),
      Some("""
        WITH toks AS (SELECT doc_id,
                             unnest(string_split(lower(text), ' ')) AS tok
                      FROM documents),
        counts AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY 1
                   ORDER BY cnt DESC, tok LIMIT 20),
        stats AS (SELECT (SELECT count(*) FROM toks) AS total,
                         (SELECT count(*) FROM counts) AS v),
        qv AS (SELECT tok,
                      CAST(round(ln(CAST(cnt + 1 AS DOUBLE) /
                        CAST(total + v + 1 AS DOUBLE)) * 1000000)
                        AS BIGINT) AS qlp
               FROM counts, stats),
        oov AS (SELECT CAST(round(ln(CAST(1 AS DOUBLE) /
                         CAST(total + v + 1 AS DOUBLE)) * 1000000)
                         AS BIGINT) AS qlp
                FROM stats),
        scored AS (SELECT t.doc_id,
                          COALESCE(q.qlp, (SELECT qlp FROM oov)) AS qlp
                   FROM toks t LEFT JOIN qv q USING (tok))
        SELECT doc_id, count(*) AS n_tokens,
               round((CAST(sum(qlp) AS DOUBLE) / 1000000) / count(*), 6)
                 AS avg_logprob
        FROM scored GROUP BY 1""")),

    // North-star: interpolated bigram LM scoring (the KenLM-shaped
    // upgrade of lm_logprob): p = 0.5·p(w2|w1) + 0.5·p_uni(w2), the
    // conditional on the corpus's top-40 bigrams with full backoff to
    // the smoothed top-20 unigram elsewhere. All probabilities/logs are
    // computed on the driver over exact counts and quantized to 1e-6
    // longs, so the distributed fold is pure integer math; the oracle
    // rebuilds the same model from the same deterministic count cuts.
    "lm_bigram_logprob" -> Entry(
      (s, dir) => TextOps.bigramLogProb(Tables.documents(s, dir), 20, 40),
      Some("""
        WITH docs AS (SELECT doc_id, string_split(lower(text), ' ') AS ws
                      FROM documents),
        toks AS (SELECT unnest(ws) AS tok FROM docs),
        ucounts AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY 1),
        utop AS (SELECT tok, cnt FROM ucounts
                 ORDER BY cnt DESC, tok LIMIT 20),
        stats AS (SELECT (SELECT count(*) FROM toks) AS total,
                         (SELECT count(*) FROM utop) AS v),
        bg AS (SELECT doc_id,
                      ws[CAST(i AS INTEGER)] || ' '
                        || ws[CAST(i AS INTEGER) + 1] AS g,
                      ws[CAST(i AS INTEGER) + 1] AS w2
               FROM docs, UNNEST(generate_series(1, len(ws) - 1)) AS t(i)
               WHERE len(ws) >= 2),
        bcounts AS (SELECT g, count(*) AS cnt FROM bg GROUP BY 1),
        btop AS (SELECT g, cnt FROM bcounts ORDER BY cnt DESC, g LIMIT 40),
        bq AS (SELECT b.g,
                      CAST(round(ln(
                        0.5 * (CAST(b.cnt AS DOUBLE) / c1.cnt) +
                        0.5 * (CAST(COALESCE(u.cnt, 0) + 1 AS DOUBLE)
                               / (total + v + 1))) * 1000000) AS BIGINT)
                        AS qlp
               FROM btop b
               JOIN ucounts c1 ON c1.tok = string_split(b.g, ' ')[1]
               LEFT JOIN utop u ON u.tok = string_split(b.g, ' ')[2]
               CROSS JOIN stats),
        fq AS (SELECT tok,
                      CAST(round(ln(0.5 * (CAST(cnt + 1 AS DOUBLE)
                        / (total + v + 1))) * 1000000) AS BIGINT) AS qlp
               FROM utop CROSS JOIN stats),
        oq AS (SELECT CAST(round(ln(0.5 * (CAST(1 AS DOUBLE)
                        / (total + v + 1))) * 1000000) AS BIGINT) AS qlp
               FROM stats),
        scored AS (SELECT bg.doc_id,
                          COALESCE(b.qlp, f.qlp,
                                   (SELECT qlp FROM oq)) AS qlp
                   FROM bg LEFT JOIN bq b ON b.g = bg.g
                           LEFT JOIN fq f ON f.tok = bg.w2),
        agg AS (SELECT doc_id, count(*) AS n_bigrams, sum(qlp) AS qsum
                FROM scored GROUP BY 1)
        SELECT d.doc_id, COALESCE(a.n_bigrams, 0) AS n_bigrams,
               (CAST(a.qsum AS DOUBLE) / 1000000) / a.n_bigrams
                 AS avg_logprob
        FROM (SELECT doc_id FROM docs) d LEFT JOIN agg a USING (doc_id)""")),

    // A7 (text flavor): top duplicated/most-frequent texts
    // (Milestone3 cell 28 value_counts().head) — deterministic tiebreak on
    // the text itself.
    "a7_top_texts" -> Entry(
      (s, dir) => Tables.documents(s, dir)
        .groupBy(col("text")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("text"))
        .limit(10)
        .select(md5(col("text")).as("text_md5"), col("cnt")),
      Some("""
        SELECT md5(text) AS text_md5, cnt FROM (
          SELECT text, count(*) AS cnt FROM documents
          GROUP BY 1 ORDER BY cnt DESC, text LIMIT 10)""")),

    // North-star: winnowing-style MD5 shingle fingerprint (engine-portable
    // rolling-hash surrogate).
    "doc_fingerprint" -> Entry(
      (s, dir) => TextOps.fingerprint(Tables.documents(s, dir))
        .select(col("doc_id"), col("fp_min"), col("fp_max")),
      Some("""
        SELECT doc_id, min(md5(s)) AS fp_min, max(md5(s)) AS fp_max
        FROM (
          SELECT doc_id, substring(text, CAST(i AS INTEGER), 8) AS s
          FROM documents,
               UNNEST(generate_series(1, greatest(length(text) - 7, 1)))
                 AS t(i))
        GROUP BY doc_id"""))
  )
}

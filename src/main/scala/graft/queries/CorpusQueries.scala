package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.CorpusOps
import Catalog.Entry

/** Corpus-preparation suite (north-star): packing, splits, normalization. */
object CorpusQueries {

  def defs: Map[String, Entry] = Map(

    // END-TO-END corpus-prep pipeline: quality gate -> normalize ->
    // exact dedup on the normalized form -> deterministic content split
    // -> per-(split, lang) report. Each stage is an oracle-proven op
    // elsewhere in the catalog (quality_score, corpus_normalize,
    // dedup_exact, corpus_det_split); this entry chains them and
    // hash-matches the COMPOSED result — the proof that pipelines built
    // from the library stay engine-verifiable, not just single ops
    // (CorpusPipelineSpec covers the invariant-level composition).
    "corpus_prep_pipeline" -> Entry(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val kept = graft.ops.TextOps.qualityScore(docs)
          .filter(col("quality_score") >= 0.5)
        val normed = kept.withColumn("norm",
          CorpusOps.normalizeText(col("text")))
        val keepIds = normed.groupBy(col("norm"))
          .agg(min(col("doc_id")).as("doc_id"))
        val deduped = normed
          .join(keepIds.select("doc_id"), Seq("doc_id"), "left_semi")
        CorpusOps.deterministicSplit(deduped)
          .groupBy(col("split"), col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(length(col("norm")).cast("long")).as("norm_chars"))
      },
      Some("""
        WITH f AS (
          SELECT doc_id, lang, text,
            CAST(length(text) AS DOUBLE) AS nc,
            CAST(len(string_split(text, ' ')) AS DOUBLE) AS nw,
            CAST(len(regexp_extract_all(text, '[\.,;:!\?]')) AS DOUBLE)
              AS np,
            CAST(len(regexp_extract_all(lower(text),
              '\b(the|a|of|and|to|in|is)\b')) AS DOUBLE) AS ns
          FROM documents),
        q AS (
          SELECT doc_id, lang, text FROM f
          WHERE (CASE WHEN nc >= 50 AND nc <= 10000 THEN 1.0 ELSE 0.0 END
                 + CASE WHEN nc / greatest(nw, 1.0) >= 2
                         AND nc / greatest(nw, 1.0) <= 12
                        THEN 1.0 ELSE 0.0 END
                 + least(ns / greatest(nw, 1.0) * 4, 1.0)
                 + (1.0 - least(np / greatest(nc, 1.0) * 10, 1.0))) / 4
                >= 0.5),
        n AS (
          SELECT doc_id, lang, text,
                 trim(regexp_replace(regexp_replace(lower(text),
                   '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm
          FROM q),
        keep AS (SELECT min(doc_id) AS doc_id FROM n GROUP BY norm),
        d AS (SELECT n.* FROM n JOIN keep USING (doc_id)),
        sp AS (SELECT lang, length(norm) AS norm_len,
                      CASE WHEN substring(md5(text), 1, 2) < '0a'
                             THEN 'test'
                           WHEN substring(md5(text), 1, 2) < '14'
                             THEN 'val'
                           ELSE 'train' END AS split
               FROM d)
        SELECT split, lang, count(*) AS n_docs,
               CAST(sum(norm_len) AS BIGINT) AS norm_chars
        FROM sp GROUP BY 1, 2""")),

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
               CAST((sum(len(string_split(text, ' ')))
                 OVER (PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - len(string_split(text, ' '))) // 512 AS BIGINT)
                 AS chunk_id
        FROM documents""")),

    // Quality-threshold retention sweep — the tuning curve of the
    // quality gate: per (source, threshold) surviving docs/tokens and
    // retention fractions, all thresholds off ONE scored scan. Every doc
    // emits every threshold (bounded 3-literal explode), so survivors
    // fold as conditional sums in the SAME aggregate as the totals — no
    // second scan, no grid join, and zero-retention cells (and a null
    // source stratum) appear natively.
    "quality_retention_sweep" -> Entry(
      (s, dir) => {
        val thresholds = array(lit(0.25), lit(0.5), lit(0.75))
        val pass = col("quality_score") >= col("threshold")
        graft.ops.TextOps.qualityScore(Tables.documents(s, dir))
          .select(col("source"), col("quality_score"),
            size(split(col("text"), " ")).cast("long").as("toks"),
            explode(thresholds).as("threshold"))
          .groupBy(col("source"), col("threshold"))
          .agg(count(lit(1)).as("all_docs"),
            sum(col("toks")).as("all_tokens"),
            sum(when(pass, 1L).otherwise(0L)).as("kept_docs"),
            sum(when(pass, col("toks")).otherwise(0L)).as("kept_tokens"))
          .select(col("source"), col("threshold"),
            col("kept_docs"), col("kept_tokens"),
            round(col("kept_docs") / col("all_docs"), 6)
              .as("doc_retention"),
            round(col("kept_tokens") / col("all_tokens"), 6)
              .as("token_retention"))
      },
      Some("""
        WITH f AS (
          SELECT source,
                 CAST(length(text) AS DOUBLE) AS nc,
                 CAST(len(string_split(text, ' ')) AS DOUBLE) AS nw,
                 CAST(len(regexp_extract_all(text, '[\.,;:!\?]'))
                   AS DOUBLE) AS np,
                 CAST(len(regexp_extract_all(lower(text),
                   '\b(the|a|of|and|to|in|is)\b')) AS DOUBLE) AS ns,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
          FROM documents),
        q AS (
          SELECT source, toks,
                 (CASE WHEN nc >= 50 AND nc <= 10000 THEN 1.0
                       ELSE 0.0 END
                  + CASE WHEN nc / greatest(nw, 1.0) >= 2
                          AND nc / greatest(nw, 1.0) <= 12 THEN 1.0
                         ELSE 0.0 END
                  + least(ns / greatest(nw, 1.0) * 4, 1.0)
                  + (1.0 - least(np / greatest(nc, 1.0) * 10, 1.0))) / 4
                   AS qs
          FROM f),
        thr AS (SELECT CAST(t AS DOUBLE) AS threshold
                FROM (VALUES (0.25), (0.5), (0.75)) v(t))
        SELECT source, threshold,
               CAST(sum(CASE WHEN qs >= threshold THEN 1 ELSE 0 END)
                 AS BIGINT) AS kept_docs,
               CAST(sum(CASE WHEN qs >= threshold THEN toks ELSE 0 END)
                 AS BIGINT) AS kept_tokens,
               round(sum(CASE WHEN qs >= threshold THEN 1 ELSE 0 END) /
                 CAST(count(*) AS DOUBLE), 6) AS doc_retention,
               round(sum(CASE WHEN qs >= threshold THEN toks ELSE 0 END) /
                 CAST(sum(toks) AS DOUBLE), 6) AS token_retention
        FROM q CROSS JOIN thr GROUP BY 1, 2""")),

    // Token-LEVEL concat-and-chunk packing (512-token sequences, docs
    // straddle boundaries — zero padding waste): per-source sequence
    // composition folded from the per-doc packing coordinates, incl. a
    // bounded range-explode for per-sequence doc occupancy. last_fill =
    // tokens actually in the final (possibly partial) sequence.
    "corpus_pack_sequences" -> Entry(
      (s, dir) => {
        val packed = CorpusOps.packSequences(
          Tables.documents(s, dir), "doc_id", "source",
          size(split(col("text"), " ")).cast("long"), budget = 512)
        val perSrc = packed.groupBy(col("source")).agg(
          count(lit(1)).as("n_docs"),
          sum(col("tokens")).as("total_tokens"),
          (max(col("end_seq")) + 1).as("n_seqs"),
          sum(when(col("end_seq") > col("start_seq"), 1L).otherwise(0L))
            .as("n_split_docs"),
          (sum(col("tokens")) - max(col("end_seq")) * lit(512L))
            .as("last_fill"))
        val occupancy = packed
          .select(col("source"),
            explode(sequence(col("start_seq"), col("end_seq"))).as("seq"))
          .groupBy(col("source"), col("seq"))
          .agg(count(lit(1)).as("nd"))
          .groupBy(col("source"))
          .agg(max(col("nd")).as("max_docs_in_seq"))
        // null-SAFE join: a null source is a real packing group
        // (Window.partitionBy groups it) — plain equality would drop
        // its composition row
        perSrc.alias("_pl")
          .join(occupancy.alias("_pr"),
            col("_pl.source") <=> col("_pr.source"))
          .select(col("_pl.*"), col("_pr.max_docs_in_seq"))
      },
      Some("""
        WITH d AS (
          SELECT doc_id, source,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
          FROM documents
          WHERE len(string_split(text, ' ')) > 0),
        st AS (
          SELECT source, tokens,
                 sum(tokens) OVER (PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - tokens AS tok_start
          FROM d),
        pk AS (
          SELECT source, tokens,
                 CAST(tok_start // 512 AS BIGINT) AS start_seq,
                 CAST((tok_start + tokens - 1) // 512 AS BIGINT)
                   AS end_seq
          FROM st),
        agg AS (
          SELECT source, count(*) AS n_docs,
                 CAST(sum(tokens) AS BIGINT) AS total_tokens,
                 CAST(max(end_seq) + 1 AS BIGINT) AS n_seqs,
                 CAST(sum(CASE WHEN end_seq > start_seq THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_split_docs,
                 CAST(sum(tokens) - max(end_seq) * 512 AS BIGINT)
                   AS last_fill
          FROM pk GROUP BY 1),
        occ AS (
          SELECT source, sq, count(*) AS nd
          FROM pk, UNNEST(generate_series(start_seq, end_seq)) AS t(sq)
          GROUP BY 1, 2),
        occm AS (
          SELECT source, CAST(max(nd) AS BIGINT) AS max_docs_in_seq
          FROM occ GROUP BY 1)
        SELECT agg.source, n_docs, total_tokens, n_seqs, n_split_docs,
               last_fill, max_docs_in_seq
        FROM agg JOIN occm
          ON agg.source IS NOT DISTINCT FROM occm.source""")),

    // UniMax uniform-coverage mix — waterfilling quotas (ascending
    // capacity, each stratum takes min(cap, remaining/strata_left),
    // 1e-6-quantized steps) + the family's deterministic coin. Budget
    // 400 exercises the full cap cascade at sf0.001/sf0.01 (every
    // stratum but en caps) and the uniform branch at sf0.1; the oracle
    // REGENERATES the waterfill with a recursive CTE.
    "corpus_unimax_mix" -> Entry(
      (s, dir) => CorpusOps.unimaxRebalance(Tables.documents(s, dir),
          "lang", "doc_id", targetTotal = 400)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("kept_docs"),
          max(col("n_docs")).as("n_docs"),
          max(col("quota")).as("quota"),
          round(max(col("keep_frac")), 6).as("keep_frac")),
      Some("""
        WITH RECURSIVE c AS (
          SELECT lang, count(*) AS n FROM documents GROUP BY 1),
        o AS (
          SELECT lang, n, CAST(n AS DOUBLE) AS cap,
                 row_number() OVER (ORDER BY CAST(n AS DOUBLE), lang)
                   AS i,
                 (SELECT count(*) FROM c) AS k
          FROM c),
        wf AS (
          SELECT 0 AS i, CAST(400 AS DOUBLE) AS remaining
          UNION ALL
          SELECT o.i,
                 wf.remaining - round(least(o.cap,
                   greatest(wf.remaining, 0) / (o.k - o.i + 1)), 6)
          FROM wf JOIN o ON o.i = wf.i + 1),
        q AS (
          SELECT o.lang, o.n,
                 round(least(o.cap,
                   greatest(wf.remaining, 0) / (o.k - o.i + 1)), 6)
                   AS quota
          FROM o JOIN wf ON wf.i = o.i - 1),
        kept AS (
          SELECT d.lang, count(*) AS kept_docs
          FROM documents d
          JOIN q ON d.lang IS NOT DISTINCT FROM q.lang
          WHERE ('0x' || substr(md5('unimax' || '|' ||
                  coalesce(d.lang, chr(1) || 'null') || '|' ||
                  CAST(d.doc_id AS VARCHAR)), 1, 8))::UBIGINT
                < CAST(floor(least(1.0, q.quota / q.n) * 4294967296.0)
                    AS BIGINT)
          GROUP BY 1)
        SELECT q.lang, kept_docs, CAST(q.n AS BIGINT) AS n_docs,
               q.quota, round(least(1.0, q.quota / q.n), 6) AS keep_frac
        FROM q JOIN kept ON q.lang IS NOT DISTINCT FROM kept.lang""")),

    // Packing MANIFEST — the writer shape: per (source, sequence) the
    // ordered doc fragments (doc_id:slice_start:slice_len) plus fill;
    // straddling docs appear once per touched sequence. Every sequence
    // fills to exactly 512 except each source's last (invariant is in
    // the data: fill and n_frags are both emitted).
    "corpus_pack_manifest" -> Entry(
      (s, dir) => {
        val m = CorpusOps.packManifest(Tables.documents(s, dir),
          "doc_id", "source",
          size(split(col("text"), " ")).cast("long"), budget = 512)
        m.groupBy(col("source"), col("seq"))
          .agg(count(lit(1)).as("n_frags"),
            sum(col("slice_len")).as("fill"),
            array_join(transform(array_sort(collect_list(struct(
                col("tok_start"), col("doc_id"), col("slice_start"),
                col("slice_len")))),
              x => concat_ws(":", x.getField("doc_id").cast("string"),
                x.getField("slice_start").cast("string"),
                x.getField("slice_len").cast("string"))), ",")
              .as("frags"))
      },
      Some("""
        WITH d AS (
          SELECT doc_id, source,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
          FROM documents
          WHERE len(string_split(text, ' ')) > 0),
        st AS (
          SELECT doc_id, source, tokens,
                 sum(tokens) OVER (PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - tokens AS tok_start
          FROM d),
        pk AS (
          SELECT doc_id, source, tokens, tok_start,
                 CAST(tok_start // 512 AS BIGINT) AS start_seq,
                 CAST((tok_start + tokens - 1) // 512 AS BIGINT)
                   AS end_seq
          FROM st),
        fr AS (
          SELECT source, sq AS seq, doc_id, tok_start,
                 greatest(sq * 512 - tok_start, 0) AS slice_start,
                 least(tokens, (sq + 1) * 512 - tok_start)
                   - greatest(sq * 512 - tok_start, 0) AS slice_len
          FROM pk, UNNEST(generate_series(start_seq, end_seq)) AS t(sq))
        SELECT source, seq, count(*) AS n_frags,
               CAST(sum(slice_len) AS BIGINT) AS fill,
               string_agg(CAST(doc_id AS VARCHAR) || ':' ||
                 CAST(slice_start AS VARCHAR) || ':' ||
                 CAST(slice_len AS VARCHAR), ',' ORDER BY tok_start)
                 AS frags
        FROM fr GROUP BY 1, 2""")),

    // Deterministic epoch shuffle: shard + in-shard order from
    // md5(epoch|doc_id) — a global random training order with NO global
    // sort (shard-keyed shuffle + bounded per-shard sort). Entry pins
    // per-shard counts and the first three docs of each shard's order.
    "corpus_epoch_shuffle" -> Entry(
      (s, dir) => {
        val sh = CorpusOps.epochShuffleShards(
          Tables.documents(s, dir), "doc_id", nShards = 8,
          epochSalt = "ep1")
        val heads = sh.filter(col("shard_pos") <= 3)
          .groupBy(col("shard"))
          .agg(array_join(transform(array_sort(
              collect_list(struct(col("shard_pos"), col("doc_id")))),
            x => x.getField("doc_id").cast("string")), ",")
            .as("first_docs"))
        sh.groupBy(col("shard")).agg(count(lit(1)).as("n_docs"))
          .join(heads, Seq("shard"))
      },
      Some("""
        WITH u AS (
          SELECT doc_id,
                 md5('ep1' || '|' || CAST(doc_id AS VARCHAR)) AS h
          FROM documents),
        a AS (
          SELECT doc_id, h,
                 CAST(('0x' || substr(h, 1, 8))::UBIGINT % 8 AS BIGINT)
                   AS shard
          FROM u),
        r AS (
          SELECT shard, doc_id,
                 row_number() OVER (PARTITION BY shard
                   ORDER BY h, doc_id) AS rn
          FROM a),
        heads AS (
          SELECT shard,
                 string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY rn)
                   AS first_docs
          FROM r WHERE rn <= 3 GROUP BY 1),
        cnt AS (SELECT shard, count(*) AS n_docs FROM r GROUP BY 1)
        SELECT shard, n_docs, first_docs
        FROM cnt JOIN heads USING (shard)""")),

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

    // EXACT k-per-stratum sample via two-phase distributed selection
    // (bucket counts -> boundary-bucket rank): no per-stratum global
    // sort; the selected set is the k smallest salted hashes, which the
    // oracle replays with a plain per-stratum row_number.
    "corpus_exact_sample" -> Entry(
      (s, dir) => CorpusOps.exactStratifiedSample(
          Tables.documents(s, dir), "lang", "doc_id", k = 30)
        .select(col("doc_id"), col("lang"), col("source")),
      Some("""
        WITH u AS (
          SELECT doc_id, lang, source,
                 ('0x' || substr(md5('esample' || '|' || coalesce(lang, chr(1) || 'null') || '|'
                     || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT AS h
          FROM documents)
        SELECT doc_id, lang, source FROM (
          SELECT doc_id, lang, source,
                 row_number() OVER (PARTITION BY lang
                   ORDER BY h, doc_id) AS rn
          FROM u) WHERE rn <= 30""")),

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
        FROM documents""")),

    // Gopher-style within-doc repetition signals: duplicated word /
    // 2-gram / 3-gram fractions, all positional array algebra (no
    // explode, no shuffle). The oracle rebuilds the same n-grams with
    // 1-based list indexing.
    "corpus_repetition" -> Entry(
      (s, dir) => CorpusOps.repetitionSignals(
          Tables.documents(s, dir), "doc_id", "text")
        .withColumn("n_words", col("n_words").cast("long")),
      Some("""
        WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                   FROM documents WHERE length(text) > 0)
        SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words,
               1.0 - CAST(len(list_distinct(ws)) AS DOUBLE)
                   / CAST(len(ws) AS DOUBLE) AS dup_word_frac,
               CASE WHEN len(ws) >= 2 THEN
                 1.0 - CAST(len(list_distinct(list_transform(
                         range(1, len(ws)),
                         i -> ws[i] || ' ' || ws[i + 1]))) AS DOUBLE)
                     / CAST(len(ws) - 1 AS DOUBLE) END AS dup_2gram_frac,
               CASE WHEN len(ws) >= 3 THEN
                 1.0 - CAST(len(list_distinct(list_transform(
                         range(1, len(ws) - 1),
                         i -> ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2])))
                       AS DOUBLE)
                     / CAST(len(ws) - 2 AS DOUBLE) END AS dup_3gram_frac
        FROM w""")),

    // Domain-mix report: the pretraining-recipe dashboard — doc and char
    // share per (source, lang), totals via a one-row broadcast.
    "corpus_domain_mix" -> Entry(
      (s, dir) => {
        val g = Tables.documents(s, dir)
          .groupBy(col("source"), col("lang"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
        val tot = g.agg(sum(col("n_docs")).as("_td"),
          sum(col("n_chars")).as("_tc"))
        g.crossJoin(broadcast(tot)).select(
          col("source"), col("lang"), col("n_docs"), col("n_chars"),
          round(col("n_docs").cast("double") / col("_td").cast("double"), 6)
            .as("doc_share"),
          round(col("n_chars").cast("double") / col("_tc").cast("double"), 6)
            .as("char_share"))
      },
      Some("""
        WITH g AS (SELECT source, lang, count(*) AS n_docs,
                          CAST(sum(n_chars) AS BIGINT) AS n_chars
                   FROM documents GROUP BY 1, 2),
        t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS td,
                     CAST(sum(n_chars) AS BIGINT) AS tc FROM g)
        SELECT source, lang, n_docs, n_chars,
               round(CAST(n_docs AS DOUBLE) / CAST(td AS DOUBLE), 6)
                 AS doc_share,
               round(CAST(n_chars AS DOUBLE) / CAST(tc AS DOUBLE), 6)
                 AS char_share
        FROM g, t""")),

    // Corpus-wide exact segment dedup (MassiveText line-dedup shape):
    // 20-word segments, first occurrence wins globally, text reassembled
    // per doc. Every doc stays in the output (kept_segs=0 if fully dup).
    "corpus_segment_dedup" -> Entry(
      (s, dir) => CorpusOps.segmentDedup(
        Tables.documents(s, dir), "doc_id", "text", segWords = 20),
      Some("""
        WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                   FROM documents WHERE length(text) > 0),
        segs AS (SELECT doc_id, CAST(i AS INTEGER) AS seg_idx,
                        array_to_string(list_slice(ws,
                          CAST(i AS INTEGER) * 20 + 1,
                          CAST(i AS INTEGER) * 20 + 20), ' ') AS seg
                 FROM w, UNNEST(range(0,
                   CAST(ceil(len(ws) / 20.0) AS BIGINT))) AS t(i)),
        rk AS (SELECT *, row_number() OVER (PARTITION BY seg
                 ORDER BY doc_id, seg_idx) AS rn FROM segs),
        agg AS (SELECT doc_id, count(*) AS total_segs,
                       CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)
                         AS BIGINT) AS kept_segs,
                       coalesce(string_agg(CASE WHEN rn = 1 THEN seg END,
                         ' ' ORDER BY seg_idx), '') AS kept_text
                FROM rk GROUP BY 1)
        -- every doc survives: empty/null-text docs carry 0 segments
        SELECT d.doc_id, coalesce(a.total_segs, 0) AS total_segs,
               coalesce(a.kept_segs, 0) AS kept_segs,
               coalesce(a.kept_text, '') AS kept_text
        FROM documents d LEFT JOIN agg a USING (doc_id)""")),

    // Paragraph-boundary dedup (the C4/RefinedWeb pass on its NATURAL
    // units). documents.text is newline-free word soup, so the entry
    // injects a deterministic paragraph break after every 5th word first
    // — the same regex rewrite replays in RE2 (identical leftmost
    // non-overlapping scan on space-separated tokens), making real
    // multi-paragraph inputs for the dedup to chew on.
    "corpus_paragraph_dedup" -> Entry(
      (s, dir) => CorpusOps.paragraphDedup(
        Tables.documents(s, dir).withColumn("ptext",
          regexp_replace(col("text"), "((?:\\S+ ){4}\\S+) ", "$1\n")),
        "doc_id", "ptext"),
      Some("""
        WITH d AS (SELECT doc_id,
                     regexp_replace(text, '((?:\S+ ){4}\S+) ',
                       '\1' || chr(10), 'g') AS ptext
                   FROM documents),
        ps AS (SELECT doc_id, string_split(ptext, chr(10)) AS paras
               FROM d),
        segs AS (SELECT doc_id, CAST(i AS INTEGER) - 1 AS seg_idx,
                        paras[CAST(i AS INTEGER)] AS seg
                 FROM ps, UNNEST(generate_series(1, len(paras))) AS t(i)
                 WHERE length(paras[CAST(i AS INTEGER)]) > 0),
        rk AS (SELECT *, row_number() OVER (PARTITION BY seg
                 ORDER BY doc_id, seg_idx) AS rn FROM segs),
        agg AS (SELECT doc_id, count(*) AS total_segs,
                       CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)
                         AS BIGINT) AS kept_segs,
                       coalesce(string_agg(CASE WHEN rn = 1 THEN seg END,
                         chr(10) ORDER BY seg_idx), '') AS kept_text
                FROM rk GROUP BY 1)
        SELECT d.doc_id, coalesce(a.total_segs, 0) AS total_segs,
               coalesce(a.kept_segs, 0) AS kept_segs,
               coalesce(a.kept_text, '') AS kept_text
        FROM d LEFT JOIN agg a USING (doc_id)"""))
  )
}

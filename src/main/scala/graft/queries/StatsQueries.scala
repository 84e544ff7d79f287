package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.StatsOps
import Catalog.Entry

/** Descriptive statistics / EDA aggregations (SURVEY.md §2.5
  * A8/A9/A15/A16/A18).
  */
object StatsQueries {

  def defs: Map[String, Entry] = Map(

    // Key-distribution skew profile over the event stream's user key:
    // top-10 heaviest users + the stats that predict shuffle behavior
    // before anyone keys a 100 TB join on the column. All doubles are
    // ratios of exact longs.
    "skew_profile" -> Entry(
      (s, dir) => StatsOps.keySkewProfile(Tables.events(s, dir),
        "user_id", topK = 10),
      Some("""
        WITH c AS (SELECT user_id, count(*) AS cnt FROM events
                   GROUP BY 1),
        s AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_total,
                     count(*) AS n_distinct, max(cnt) AS max_cnt
              FROM c),
        t AS (SELECT user_id, cnt FROM c
              ORDER BY cnt DESC, user_id LIMIT 10)
        SELECT t.user_id, t.cnt,
               CAST(t.cnt AS DOUBLE) / n_total AS share,
               n_total, n_distinct,
               CAST(max_cnt AS DOUBLE) * n_distinct / n_total
                 AS skew_factor
        FROM t, s""")),

    // A8: describe/summary with exact interpolated quartiles
    // (Milestone3 cells 25/36/40).
    "a8_summary_stats" -> Entry(
      (s, dir) => StatsOps.summaryStatsSorted(Tables.lineitem(s, dir),
        "l_returnflag", "l_extendedprice"),
      Some("""
        SELECT l_returnflag,
               count(l_extendedprice) AS n,
               round(sum(l_extendedprice), 2) AS sum_v,
               round(sum(l_extendedprice), 2) / count(l_extendedprice)
                 AS mean_v,
               round(stddev_samp(l_extendedprice), 4) AS std_v,
               round(min(l_extendedprice), 4) AS min_v,
               round(quantile_cont(l_extendedprice, 0.25), 4) AS q25,
               round(quantile_cont(l_extendedprice, 0.5), 4) AS median,
               round(quantile_cont(l_extendedprice, 0.75), 4) AS q75,
               round(max(l_extendedprice), 4) AS max_v
        FROM lineitem GROUP BY 1""")),

    // A9/A18: null-ratio and predicate-share means (isna().mean(),
    // (len<10).mean() — Milestone3 cells 27/37, Milestone4 cell 9).
    // Column profiling sweep over `part` (strings, ints, and a
    // decimal-cast double — types whose string rendering is engine-
    // identical).
    "a19_profile_columns" -> Entry(
      (s, dir) => {
        import org.apache.spark.sql.functions.col
        StatsOps.profileColumns(Tables.part(s, dir), Seq(
          "p_partkey" -> col("p_partkey"),
          "p_name" -> col("p_name"),
          "p_brand" -> col("p_brand"),
          "p_type" -> col("p_type"),
          "p_size" -> col("p_size"),
          "p_retailprice" -> col("p_retailprice").cast("decimal(12,2)")))
      },
      Some(Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size",
          "p_retailprice").map { c =>
        val e = if (c == "p_retailprice") "CAST(p_retailprice AS DECIMAL(12,2))"
                else c
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
               count(*) - count($e) AS n_nulls,
               count(DISTINCT $e) AS n_distinct,
               CAST(min($e) AS VARCHAR) AS min_str,
               CAST(max($e) AS VARCHAR) AS max_str
            FROM part"""
      }.mkString("\n        UNION ALL\n        "))),

    "a9a18_share_of_rows" -> Entry(
      (s, dir) => StatsOps.shareOfRows(Tables.part(s, dir), "p_brand", Seq(
        "share_large" -> (col("p_size") >= 25),
        "share_economy" -> col("p_type").contains("ECONOMY"),
        "share_null_type" -> col("p_type").isNull)),
      Some("""
        SELECT p_brand, count(*) AS n_rows,
               CAST(sum(CASE WHEN p_size >= 25 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*) AS share_large,
               CAST(sum(CASE WHEN p_type LIKE '%ECONOMY%' THEN 1 ELSE 0 END)
                 AS DOUBLE) / count(*) AS share_economy,
               CAST(sum(CASE WHEN p_type IS NULL THEN 1 ELSE 0 END)
                 AS DOUBLE) / count(*) AS share_null_type
        FROM part GROUP BY 1""")),

    // A8 (text flavor): describe() of text_length per group
    // (Milestone3 cell 25). Integer lengths sum exactly, so the mean is
    // bit-identical without rounding.
    "a8_text_length_stats" -> Entry(
      (s, dir) => {
        val n = count(lit(1))
        Tables.documents(s, dir)
          .groupBy(col("lang"))
          .agg(n.as("n_docs"),
            sum(length(col("text"))).as("sum_len"),
            (sum(length(col("text"))).cast("double") / n).as("mean_len"),
            round(stddev_samp(length(col("text"))), 4).as("std_len"),
            min(length(col("text"))).cast("long").as("min_len"),
            max(length(col("text"))).cast("long").as("max_len"))
      },
      Some("""
        SELECT lang, count(*) AS n_docs,
               CAST(sum(length(text)) AS BIGINT) AS sum_len,
               CAST(sum(length(text)) AS DOUBLE) / count(*) AS mean_len,
               round(stddev_samp(length(text)), 4) AS std_len,
               min(length(text)) AS min_len,
               max(length(text)) AS max_len
        FROM documents GROUP BY 1""")),

    // P11: spam-bin predicate — keep bins whose share of high-value events
    // stays under 0.5 (Milestone4 cell 16 share_cta filter).
    "p11_spam_bin_filter" -> Entry(
      (s, dir) => {
        val n = count(lit(1))
        Tables.events(s, dir)
          .groupBy(window(col("ts"), "6 hours"), col("event_type"))
          .agg(n.as("n_events"),
            (sum((col("value") > 100).cast("long")).cast("double") / n)
              .as("share_gt100"))
          .select(col("window.start").as("bin_ts"), col("event_type"),
            col("n_events"), col("share_gt100"))
          .filter(col("share_gt100") < 0.5)
      },
      Some("""
        SELECT * FROM (
          SELECT time_bucket(INTERVAL '6 hours', CAST(ts AS TIMESTAMP))
                   AS bin_ts,
                 event_type, count(*) AS n_events,
                 CAST(sum(CASE WHEN value > 100 THEN 1 ELSE 0 END)
                   AS DOUBLE) / count(*) AS share_gt100
          FROM events GROUP BY 1, 2)
        WHERE share_gt100 < 0.5""")),

    // Sketch path for A8/A10 at 100 TB (SCALE.md "exact-vs-approx"):
    // fixed-memory percentile_approx + HLL distinct. METRIC-ENVELOPE
    // ORACLE (the tdigest rank-bound trick): the estimates themselves
    // are engine-specific by construction, but their GUARANTEES are
    // exact booleans — the approx median's true rank sits within the
    // KLL accuracy envelope (n/accuracy + 1), and the HLL distinct
    // count sits within 3x its configured relative standard deviation
    // of the exact count (which IS SQL-replayable and emitted). Any
    // estimator drift outside its contract breaks the hash.
    "approx_sketch_stats" -> Entry(
      (s, dir) => {
        // the exact distinct runs as its OWN two-phase aggregation: a
        // countDistinct mixed into the sketch agg plans an Expand that
        // routes every duplicated row through the percentile buffer
        // (measured 9s vs ~1s split)
        val exact = Tables.lineitem(s, dir)
          .select(col("l_returnflag"), col("l_partkey")).distinct()
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n_parts_exact"))
        val est = Tables.lineitem(s, dir)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            expr("percentile_approx(l_extendedprice, 0.5, 10000)")
              .as("_amed"),
            approx_count_distinct(col("l_partkey"), rsd = 0.05)
              .as("_aparts"))
          .join(exact, Seq("l_returnflag"))
        Tables.lineitem(s, dir)
          .select(col("l_returnflag"), col("l_extendedprice"))
          .join(broadcast(est), Seq("l_returnflag"))
          .groupBy(col("l_returnflag"))
          .agg(first(col("n")).as("n"),
            first(col("n_parts_exact")).as("n_parts_exact"),
            // the returned VALUE occupies the rank interval
            // [count(<)+1, count(<=)] — with duplicates tied at the
            // median, testing count(<=) alone would overshoot the
            // envelope even for a perfectly accurate sketch; the
            // guarantee is that SOME rank of the value is within bound
            sum(when(col("l_extendedprice") < col("_amed"), 1L)
              .otherwise(0L)).as("_rank_lt"),
            sum(when(col("l_extendedprice") <= col("_amed"), 1L)
              .otherwise(0L)).as("_rank_le"),
            first(col("_aparts")).as("_aparts"))
          .select(col("l_returnflag"), col("n"), col("n_parts_exact"),
            (col("_rank_lt") + 1 <=
                lit(0.5) * col("n") + col("n") / lit(10000.0) + 1 &&
              col("_rank_le") >=
                lit(0.5) * col("n") - col("n") / lit(10000.0) - 1)
              .as("median_rank_ok"),
            (abs(col("_aparts") - col("n_parts_exact")).cast("double") <=
              lit(3 * 0.05) * col("n_parts_exact")).as("hll_ok"))
      },
      Some("""
        SELECT l_returnflag, count(*) AS n,
               count(DISTINCT l_partkey) AS n_parts_exact,
               TRUE AS median_rank_ok, TRUE AS hll_ok
        FROM lineitem GROUP BY 1""")),

    // A8 at 100 TB: mergeable t-digest quantiles (typed Aggregator,
    // graft.functions.TDigestAgg) — O(compression) state per group vs
    // exact percentile's O(group) buffer. Approximate -> rows-only;
    // TDigestSpec pins the error against the exact quartiles.
    // Oracle strategy (approximate estimates are not SQL-derivable, but
    // their GUARANTEE is): the entry joins each sketch estimate back to
    // the raw values and emits whether its exact rank sits within the
    // t-digest rank-error envelope (1% of n + 1 for discreteness) of the
    // requested quantile — booleans the oracle pins to TRUE, plus the
    // exact group count. Any estimator drift breaks the hash; the raw
    // estimate values stay pinned in TDigestSpec.
    "approx_tdigest_quantiles" -> Entry(
      (s, dir) => {
        val qsSpec = Seq(0.25, 0.5, 0.75)
        val qs = graft.functions.TDigestAgg.tdigestQuantiles(
          col("l_extendedprice"), 200.0, qsSpec)
        // r19: the t-digest insert loop is the entry's per-row hot path
        // (imperative aggregate, ~600k inserts at sf0.1) and the
        // lineitem parquet arrives as 1-2 input splits — Rebalance
        // spreads the PARTIAL aggregation over the full parallelism
        // (the scale no-op idiom; at real scale the scan already fans
        // out). The digest's partial-merge order changes, which is
        // within the op's contract: the output is the rank-envelope
        // flags, pinned to a ±1% envelope the estimate stays inside on
        // any merge order (oracle re-verified at all three SFs).
        val est = graft.ops.Rebalance(Tables.lineitem(s, dir)
            .select(col("l_returnflag"), col("l_extendedprice")))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"), qs.as("_qs"))
        val ranks = Tables.lineitem(s, dir)
          .select(col("l_returnflag"), col("l_extendedprice"))
          .join(broadcast(est), Seq("l_returnflag"))
          .groupBy(col("l_returnflag"))
          .agg(first(col("n")).as("n"),
            qsSpec.indices.flatMap(i => Seq(
              sum(when(col("l_extendedprice") < col("_qs").getItem(i),
                1L).otherwise(0L)).as(s"_rlt$i"),
              sum(when(col("l_extendedprice") <= col("_qs").getItem(i),
                1L).otherwise(0L)).as(s"_rle$i"))): _*)
        // the estimate's rank INTERVAL [count(<)+1, count(<=)] must
        // overlap the envelope — count(<=) alone would overshoot when
        // duplicates tie at the estimate
        val okCols = qsSpec.zipWithIndex.map { case (q, i) =>
          (col(s"_rlt$i") + 1 <= lit(q) * col("n") +
              lit(0.01) * col("n") + 1 &&
            col(s"_rle$i") >= lit(q) * col("n") -
              lit(0.01) * col("n") - 1)
            .as(s"rank_ok_q${(q * 100).toInt}")
        }
        ranks.select(col("l_returnflag") +: col("n") +: okCols: _*)
      },
      Some("""
        SELECT l_returnflag, count(*) AS n,
               TRUE AS rank_ok_q25, TRUE AS rank_ok_q50,
               TRUE AS rank_ok_q75
        FROM lineitem GROUP BY 1""")),

    // North-star: mergeable Misra-Gries heavy hitters — the A7 top-k
    // family's sketch path for cardinalities too large to count exactly.
    // Run here in the EXACT regime (capacity 32 >> 5 distinct langs, so
    // no decrement/cut ever fires and counts are true counts), which
    // makes the sketch hash-checkable against a plain count oracle; the
    // approximate regime's lower-bound/error guarantees are pinned in
    // MisraGriesSpec.
    "approx_heavy_hitters" -> Entry(
      (s, dir) => Tables.documents(s, dir)
        .groupBy(col("source"))
        .agg(graft.functions.MisraGriesAgg
          .heavyHitters(col("lang"), 32, 3).as("_hh"))
        .select(col("source"), posexplode(col("_hh")).as(Seq("_p", "_kv")))
        .select(col("source"), (col("_p") + 1).as("rnk"),
          col("_kv._1").as("lang"), col("_kv._2").as("cnt")),
      Some("""
        SELECT source, CAST(rnk AS INTEGER) AS rnk, lang, cnt FROM (
          SELECT source, lang, count(*) AS cnt,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY count(*) DESC, lang) AS rnk
          FROM documents GROUP BY source, lang)
        WHERE rnk <= 3""")),

    // STREAMING twin of approx_heavy_hitters — the speed-layer shape the
    // reference's architecture implies: the same mergeable Misra-Gries
    // sketch as a stateful streaming aggregation (complete mode) over the
    // documents FILE STREAM, drained with an AvailableNow trigger into a
    // memory sink. The sketch buffers merge across micro-batches, and in
    // the exact regime (capacity 32 >> 5 langs) the merged counts are
    // true counts whatever the batch split — so the SAME count oracle as
    // the batch entry hash-checks this path too. The approximate
    // regime's cross-batch accumulation is pinned in StreamingSpec.
    "stream_heavy_hitters" -> Entry(
      (s, dir) => {
        val sch = s.read.parquet(s"$dir/documents.parquet").schema
        // the file source needs a directory/glob, not a bare file path
        // (a bare file becomes the basePath, which must be a directory);
        // the glob keeps the parent as basePath and lists only this table
        val q = s.readStream.schema(sch).parquet(s"$dir/documents.parque*")
          .groupBy(col("source"))
          .agg(graft.functions.MisraGriesAgg
            .heavyHitters(col("lang"), 32, 3).as("_hh"))
          .writeStream.queryName("graft_stream_hh")
          .outputMode("complete")
          .format("memory")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally q.stop()
        s.table("graft_stream_hh")
          .select(col("source"), posexplode(col("_hh")).as(Seq("_p", "_kv")))
          .select(col("source"), (col("_p") + 1).as("rnk"),
            col("_kv._1").as("lang"), col("_kv._2").as("cnt"))
      },
      Some("""
        SELECT source, CAST(rnk AS INTEGER) AS rnk, lang, cnt FROM (
          SELECT source, lang, count(*) AS cnt,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY count(*) DESC, lang) AS rnk
          FROM documents GROUP BY source, lang)
        WHERE rnk <= 3""")),

    // A15: Pearson correlation per group (Milestone3 cells 44/56/58).
    // North-star weighted stats: exact weighted median (lower quantile)
    // of price by quantity weight. Exactness rides on integer-valued
    // weights: every partial/running sum is exactly representable, so
    // the cumulative-weight threshold compares identically in both
    // engines regardless of each engine's summation association.
    // Bucketed form: l_returnflag has 3 values, so the direct window
    // cumsum would cap the heavy sort at 3 tasks cluster-wide; the
    // width_bucket two-level scan keeps every stage fully parallel
    // (semantics identical — WeightedQuantileSpec pins parity).
    "a8_weighted_median" -> Entry(
      (s, dir) => graft.ops.StatsOps.weightedQuantileBucketed(
        Tables.lineitem(s, dir), "l_returnflag", "l_extendedprice",
        "l_quantity", 0.5),
      Some("""
        WITH pv AS (SELECT l_returnflag, l_extendedprice AS v,
                           sum(l_quantity) AS w
                    FROM lineitem GROUP BY 1, 2),
        c AS (SELECT l_returnflag, v, w,
                     sum(w) OVER (PARTITION BY l_returnflag ORDER BY v
                                  ROWS UNBOUNDED PRECEDING) AS cw,
                     sum(w) OVER (PARTITION BY l_returnflag) AS tw
              FROM pv)
        SELECT l_returnflag, min(v) AS wq_l_extendedprice,
               max(tw) AS total_weight
        FROM c WHERE cw >= 0.5 * tw GROUP BY 1""")),

    // North-star feature engineering: equi-depth binning — per-key value
    // deciles via ntile (SQL-standard floor distribution), deterministic
    // under ties with the (value, event_id) order.
    "w_ntile_bins" -> Entry(
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type"))
          .orderBy(col("value"), col("event_id"))
        Tables.events(s, dir)
          .select(col("event_id"), col("event_type"), col("value"),
            ntile(10).over(w).as("decile"))
      },
      Some("""
        SELECT event_id, event_type, value,
               ntile(10) OVER (PARTITION BY event_type
                               ORDER BY value, event_id) AS decile
        FROM events""")),

    // Ingest drift monitoring: PSI per lang between even/odd doc_id
    // populations over fixed-width n_chars bins. Deterministic binning +
    // Laplace smoothing on both engines; psi rounded 6 (ln is the one
    // transcendental; summation-order ulps are far below the rounding).
    "psi_drift" -> Entry(
      (s, dir) => graft.ops.StatsOps.psiDrift(
        Tables.documents(s, dir)
          .withColumn("side", (col("doc_id") % 2).cast("string")),
        groupCol = "lang", sideCol = "side", refSide = "0",
        valCol = "n_chars", lo = 0.0, hi = 600.0, nBins = 12),
      Some("""
        WITH d AS (SELECT lang, doc_id % 2 = 0 AS is_ref,
                     least(greatest(CAST(floor(n_chars / 50.0) AS INTEGER),
                       0), 11) AS bin
                   FROM documents),
        counts AS (SELECT lang, is_ref, bin, count(*) AS n
                   FROM d GROUP BY 1, 2, 3),
        tot AS (SELECT lang, is_ref, CAST(sum(n) AS BIGINT) AS tot
                FROM counts GROUP BY 1, 2),
        grid AS (SELECT lang, is_ref, tot, CAST(b AS INTEGER) AS b
                 FROM tot, UNNEST(generate_series(0, 11)) AS g(b)),
        sm AS (SELECT grid.lang, grid.is_ref, grid.b,
                 (COALESCE(counts.n, 0) + 0.5)
                   / (grid.tot + 0.5 * 12) AS share
               FROM grid LEFT JOIN counts
                 ON counts.lang = grid.lang
                AND counts.is_ref = grid.is_ref AND counts.bin = grid.b),
        psi AS (SELECT r.lang,
                       sum((r.share - c.share) * ln(r.share / c.share))
                         AS psi
                FROM sm r JOIN sm c
                  ON r.lang = c.lang AND r.b = c.b
                 AND r.is_ref AND NOT c.is_ref
                GROUP BY 1),
        langs AS (SELECT DISTINCT lang FROM d)
        -- full-outer semantics: a lang present in only one population
        -- still emits a row (psi NULL, absent side n=0)
        SELECT l.lang, round(p.psi, 6) AS psi,
               COALESCE(tr.tot, 0) AS n_ref, COALESCE(tc.tot, 0) AS n_cur
        FROM langs l
        LEFT JOIN psi p ON p.lang = l.lang
        LEFT JOIN tot tr ON tr.lang = l.lang AND tr.is_ref
        LEFT JOIN tot tc ON tc.lang = l.lang AND NOT tc.is_ref""")),

    "a15_corr" -> Entry(
      (s, dir) => StatsOps.corrBy(Tables.lineitem(s, dir),
        "l_returnflag", "l_quantity", "l_extendedprice"),
      Some("""
        SELECT l_returnflag,
               round(corr(l_quantity, l_extendedprice), 4) AS pearson_r,
               count(*) AS n
        FROM lineitem GROUP BY 1""")),

    // A16: lag-correlation sweep over a daily per-key series
    // (Milestone4 cell 13 `lag_corr`).
    "a16_lag_corr_sweep" -> Entry(
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
          .agg(count(lit(1)).cast("double").as("n_events"),
            round(sum(col("value")), 2).as("sum_value"))
        StatsOps.lagCorrSweep(daily, "event_type", "day",
          "n_events", "sum_value", 3)
      },
      Some("""
        WITH daily AS (
          SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day, event_type,
                 CAST(count(*) AS DOUBLE) AS n_events,
                 round(sum(value), 2) AS sum_value
          FROM events GROUP BY 1, 2),
        shifted AS (
          SELECT event_type, sum_value,
                 lead(n_events, 3) OVER w AS x_m3,
                 lead(n_events, 2) OVER w AS x_m2,
                 lead(n_events, 1) OVER w AS x_m1,
                 n_events AS x_p0,
                 lag(n_events, 1) OVER w AS x_p1,
                 lag(n_events, 2) OVER w AS x_p2,
                 lag(n_events, 3) OVER w AS x_p3
          FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day))
        SELECT event_type,
               round(corr(x_m3, sum_value), 4) AS corr_lag_m3,
               round(corr(x_m2, sum_value), 4) AS corr_lag_m2,
               round(corr(x_m1, sum_value), 4) AS corr_lag_m1,
               round(corr(x_p0, sum_value), 4) AS corr_lag_p0,
               round(corr(x_p1, sum_value), 4) AS corr_lag_p1,
               round(corr(x_p2, sum_value), 4) AS corr_lag_p2,
               round(corr(x_p3, sum_value), 4) AS corr_lag_p3
        FROM shifted GROUP BY 1"""))
  )
}

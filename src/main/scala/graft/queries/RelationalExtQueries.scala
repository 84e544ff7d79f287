package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{AsOfJoinOps, CorpusOps, RelationalOps, SimilarityOps,
  TopKOps}
import Catalog.Entry

/** Round-2 relational/time-series extensions: as-of join, banded range
  * join, pivot, rollup, per-group vector centroids, and deterministic
  * stratified mix-sampling. Each is a first-class operator with a plain-SQL
  * DuckDB twin (no engine-specific keywords like ASOF JOIN, so the oracle
  * checks semantics, not a builtin).
  */
object RelationalExtQueries {

  def defs: Map[String, Entry] = Map(

    // As-of join: each click gets the most recent purchase value by the
    // same user at or before its timestamp (union + gaps-and-islands fill:
    // one shuffle, no range join — the kdb/Flink formulation).
    "j5_asof_join" -> Entry(
      (s, dir) => {
        val e = Tables.events(s, dir)
        val left = e.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        val right = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id"), col("value"))
        AsOfJoinOps.asofJoin(left, right, "user_id", "ts", "event_id",
            "value")
          .select(col("event_id"), col("user_id"), col("value"),
            col("asof_value"))
      },
      Some("""
        WITH l AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
                          value
                   FROM events WHERE event_type = 'click'),
        r AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
              FROM events WHERE event_type = 'purchase'),
        u AS (SELECT event_id, user_id, ts, value,
                     CAST(NULL AS DOUBLE) AS r_value, 1 AS is_left FROM l
              UNION ALL
              SELECT event_id, user_id, ts, CAST(NULL AS DOUBLE), value, 0
              FROM r),
        f AS (SELECT *, count(r_value) OVER (PARTITION BY user_id
                ORDER BY ts, is_left, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
              FROM u),
        g AS (SELECT event_id, user_id, value, is_left,
                     max(r_value) OVER (PARTITION BY user_id, grp)
                       AS asof_value
              FROM f)
        SELECT event_id, user_id, value, asof_value
        FROM g WHERE is_left = 1""")),

    // O2/O3 at scale: per-group top-k through the custom TopKPerGroup
    // plan node (map-side bounded heaps, shuffle only survivors) instead
    // of the window row_number spelling that sorts every discarded row.
    // The oracle IS the window spelling — same rows, different plan.
    "o2_topk_per_group" -> Entry(
      (s, dir) => TopKOps.topKPerGroup(
          Tables.events(s, dir).filter(col("value").isNotNull)
            .select(col("event_type"), col("event_id"), col("value")),
          Seq("event_type"), "value", descending = true, "event_id", 10)
        .select(col("event_type"), col("event_id"), col("value")),
      Some("""
        SELECT event_type, event_id, value FROM (
          SELECT event_type, event_id, value,
                 row_number() OVER (PARTITION BY event_type
                   ORDER BY value DESC, event_id) AS rn
          FROM events WHERE value IS NOT NULL)
        WHERE rn <= 10""")),

    // Deterministic weighted sampling (A-ES with hashed randomness):
    // k docs per lang, selection probability proportional to n_chars,
    // reproducible on any layout. Runs through the TopKPerGroup heap
    // plan; the oracle replays u = (hash32+0.5)/2^32 and the u^(1/w)
    // ranking in SQL.
    "corpus_weighted_sample" -> Entry(
      (s, dir) => CorpusOps.weightedSample(Tables.documents(s, dir),
          "lang", "doc_id", "n_chars", 20)
        .select(col("doc_id"), col("lang"), col("n_chars")),
      Some("""
        WITH u AS (
          SELECT doc_id, lang, n_chars,
                 (('0x' || substr(md5('wsample' || '|' || lang || '|'
                     || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT + 0.5)
                   / 4294967296.0 AS u
          FROM documents WHERE n_chars > 0)
        SELECT doc_id, lang, n_chars FROM (
          SELECT doc_id, lang, n_chars,
                 row_number() OVER (PARTITION BY lang
                   ORDER BY pow(u, 1.0 / n_chars) DESC, doc_id) AS rn
          FROM u)
        WHERE rn <= 20""")),

    // Symmetric int8 embedding quantization: per-vector scale, codes as
    // a comma-joined string (int-exact across engines). Exact IEEE
    // float->double, division and round on both sides.
    "vec_quantize_int8" -> Entry(
      (s, dir) => SimilarityOps.quantizeInt8(Tables.embeddings(s, dir)),
      Some("""
        WITH m AS (
          SELECT vec_id, embedding,
                 CAST(list_max(list_transform(embedding, x -> abs(x)))
                   AS DOUBLE) / 127.0 AS scale
          FROM embeddings)
        SELECT vec_id, scale,
               array_to_string(list_transform(embedding, x ->
                 CAST(CAST(CASE WHEN scale > 0
                   THEN round(CAST(x AS DOUBLE) / scale)
                   ELSE 0 END AS INTEGER) AS VARCHAR)), ',') AS q_csv
        FROM m""")),

    // Banded range join: purchases by the same user within 30 min after
    // each click, zero-filled (join key quantized to 30-min bands keeps the
    // join an equi-join touching <= 2 bands per probe).
    "j6_range_join" -> Entry(
      (s, dir) => {
        val e = Tables.events(s, dir)
        val left = e.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        val right = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("value"))
        AsOfJoinOps.rangeJoinCount(left, right, "user_id", "ts",
          "event_id", "value", 1800)
      },
      Some("""
        WITH l AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
                   FROM events WHERE event_type = 'click'),
        r AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
              FROM events WHERE event_type = 'purchase')
        SELECT l.event_id, l.user_id,
               count(r.ts) AS n_follow,
               coalesce(round(sum(r.value), 2), 0) AS sum_follow
        FROM l LEFT JOIN r ON l.user_id = r.user_id
          AND r.ts > l.ts AND r.ts <= l.ts + INTERVAL '30 minutes'
        GROUP BY 1, 2""")),

    // Pivot (long -> wide): daily event counts + value sums per type.
    "e3_pivot_daily" -> Entry(
      (s, dir) => Tables.events(s, dir)
        .groupBy(date_trunc("day", col("ts")).as("day_ts"))
        .pivot("event_type",
          Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sv")),
      Some("""
        SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day_ts,
          count(*) FILTER (WHERE event_type = 'click') AS click_n,
          round(sum(value) FILTER (WHERE event_type = 'click'), 2)
            AS click_sv,
          count(*) FILTER (WHERE event_type = 'error') AS error_n,
          round(sum(value) FILTER (WHERE event_type = 'error'), 2)
            AS error_sv,
          count(*) FILTER (WHERE event_type = 'purchase') AS purchase_n,
          round(sum(value) FILTER (WHERE event_type = 'purchase'), 2)
            AS purchase_sv,
          count(*) FILTER (WHERE event_type = 'signup') AS signup_n,
          round(sum(value) FILTER (WHERE event_type = 'signup'), 2)
            AS signup_sv,
          count(*) FILTER (WHERE event_type = 'view') AS view_n,
          round(sum(value) FILTER (WHERE event_type = 'view'), 2)
            AS view_sv
        FROM events GROUP BY 1""")),

    // Rollup: customer count + balances by (nation, segment) with
    // subtotals and grand total (broadcast dim join + rollup grouping sets).
    "u2_rollup_acctbal" -> Entry(
      (s, dir) => Tables.customer(s, dir)
        .join(broadcast(Tables.nation(s, dir)),
          col("c_nationkey") === col("n_nationkey"))
        .rollup(col("n_name"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust"),
          round(sum(col("c_acctbal")), 2).as("sum_bal"))
        .select(col("n_name"), col("c_mktsegment"), col("n_cust"),
          col("sum_bal")),
      Some("""
        SELECT n_name, c_mktsegment, count(*) AS n_cust,
               round(sum(c_acctbal), 2) AS sum_bal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY ROLLUP (n_name, c_mktsegment)""")),

    // Cube: all grouping-set combinations of (status, priority) — the
    // full grouping-sets family next to u2's rollup.
    "u3_cube_orders" -> Entry(
      (s, dir) => Tables.orders(s, dir)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("sum_price"))
        .select(col("o_orderstatus"), col("o_orderpriority"),
          col("n_orders"), col("sum_price")),
      Some("""
        SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS sum_price
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""")),

    // Per-label embedding centroids, long-form; 1e-6 quantized exact
    // integer sums make the aggregate order-independent (see
    // SimilarityOps.groupCentroids).
    "vec_centroid_by_label" -> Entry(
      (s, dir) => SimilarityOps.groupCentroids(
        Tables.embeddings(s, dir), "label"),
      Some("""
        WITH x AS (
          SELECT label, CAST(i AS INTEGER) - 1 AS dim,
                 CAST(round(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE)
                   * 1000000) AS BIGINT) AS q
          FROM embeddings,
               UNNEST(generate_series(1, len(embedding))) AS t(i))
        SELECT label, dim, count(*) AS n_vecs,
               CAST(sum(q) AS DOUBLE) / 1000000 / count(*) AS centroid
        FROM x GROUP BY 1, 2""")),

    // Deterministic stratified mix-sampling (domain reweighting): per-lang
    // keep-fractions decided by a salted hash of (lang, doc_id) only.
    "corpus_mix_sample" -> Entry(
      (s, dir) => CorpusOps.mixSample(Tables.documents(s, dir),
          "lang", "doc_id",
          Map("en" -> 0.75, "es" -> 0.5, "fr" -> 0.5, "de" -> 0.25,
            "zh" -> 0.1))
        .select(col("doc_id"), col("lang"), col("source")),
      Some("""
        SELECT doc_id, lang, source FROM documents
        WHERE substr(md5('mix' || '|' || lang || '|'
                || CAST(doc_id AS VARCHAR)), 1, 8)
          < CASE lang WHEN 'de' THEN '40000000'
                      WHEN 'en' THEN 'c0000000'
                      WHEN 'es' THEN '80000000'
                      WHEN 'fr' THEN '80000000'
                      WHEN 'zh' THEN '19999999'
                      ELSE '00000000' END""")),

    // Temperature-based language rebalance (mC4/T5 alpha-sampling with a
    // UniMax-style one-epoch cap): per-lang keep probability derives
    // from corpus counts (w = n^(1/T), T = 2), decided per row by the
    // salted-hash coin. At sf0.01 the skewed corpus (en 218 of 500)
    // flattens to ~equal expected takes per lang at ~300 total. Oracle
    // replays counts -> quantized weights -> integer Z -> round-6 frac
    // -> hash threshold, floor()'d explicitly on both engines.
    "corpus_temperature_mix" -> Entry(
      (s, dir) => CorpusOps.temperatureRebalance(Tables.documents(s, dir),
          "lang", "doc_id", temperature = 2.0, targetTotal = 300)
        .select(col("doc_id"), col("lang"), col("n_docs"),
          col("keep_frac")),
      Some("""
        WITH c AS (SELECT lang, count(*) AS n_docs FROM documents
                   GROUP BY 1),
        w AS (SELECT lang, n_docs,
                     CAST(round(pow(CAST(n_docs AS DOUBLE), 0.5) * 1000000)
                       AS BIGINT) AS wq
              FROM c),
        z AS (SELECT sum(wq) AS z FROM w),
        p AS (SELECT lang, n_docs,
                     least(1.0, round((CAST(300 AS DOUBLE) * wq) /
                       (CAST(z AS DOUBLE) * n_docs), 6)) AS keep_frac
              FROM w, z)
        SELECT d.doc_id, d.lang, p.n_docs, p.keep_frac
        FROM documents d JOIN p USING (lang)
        WHERE ('0x' || substr(md5('trebal' || '|' || coalesce(lang, chr(1) || 'null') || '|'
                || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
              < CAST(floor(keep_frac * 4294967296.0) AS BIGINT)""")),

    // North-star lake versioning: snapshot diff — classify every key as
    // added/removed/changed/unchanged between two snapshots via content
    // hashes (RelationalOps.snapshotDiff). Price goes through
    // decimal(12,2) so the hashed string form is engine-portable.
    "snapshot_diff" -> Entry(
      (s, dir) => {
        val base = Tables.orders(s, dir).select(col("o_orderkey"),
          col("o_custkey"),
          col("o_totalprice").cast("decimal(12,2)").as("price"))
        val before = base.filter(pmod(col("o_orderkey"), lit(7)) =!= 0)
        val after = base.filter(pmod(col("o_orderkey"), lit(5)) =!= 0)
          .withColumn("price",
            when(pmod(col("o_orderkey"), lit(3)) === 0,
              (col("price") * 2).cast("decimal(12,2)"))
              .otherwise(col("price")))
        graft.ops.RelationalOps.snapshotDiff(before, after, "o_orderkey",
          Seq("o_custkey", "price"))
      },
      Some("""
        WITH base AS (SELECT o_orderkey, o_custkey,
                             CAST(o_totalprice AS DECIMAL(12,2)) AS price
                      FROM orders),
        b AS (SELECT o_orderkey,
                     md5(coalesce('v' || CAST(o_custkey AS VARCHAR), 'n')
                         || '|'
                         || coalesce('v' || CAST(price AS VARCHAR), 'n'))
                       AS hb
              FROM base WHERE o_orderkey % 7 <> 0),
        a AS (SELECT o_orderkey,
                     md5(coalesce('v' || CAST(o_custkey AS VARCHAR), 'n')
                         || '|'
                         || coalesce('v' || CAST(price AS VARCHAR), 'n'))
                       AS ha
              FROM (SELECT o_orderkey, o_custkey,
                           CASE WHEN o_orderkey % 3 = 0
                                THEN CAST(price * 2 AS DECIMAL(12,2))
                                ELSE price END AS price
                    FROM base WHERE o_orderkey % 5 <> 0) t)
        SELECT coalesce(b.o_orderkey, a.o_orderkey) AS o_orderkey,
               CASE WHEN hb IS NULL THEN 'added'
                    WHEN ha IS NULL THEN 'removed'
                    WHEN hb = ha THEN 'unchanged'
                    ELSE 'changed' END AS status
        FROM b FULL OUTER JOIN a ON b.o_orderkey = a.o_orderkey""")),

    // CDC merge (MERGE INTO semantics, RelationalOps.applyChangeSet):
    // a change log derived from orders — latest change per key wins by
    // log sequence (o_orderkey), op U upserts / D deletes, keys shifted
    // by +1e6 for 1-in-7 rows so the log also INSERTS unseen keys — is
    // applied onto the customer snapshot. The oracle replays latest-wins
    // with a row_number cut, then anti-join + union.
    "cdc_merge" -> Entry(
      (s, dir) => {
        val base = Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_acctbal"))
        val changes = Tables.orders(s, dir).select(
          when(col("o_custkey") % 7 === 0, col("o_custkey") + 1000000)
            .otherwise(col("o_custkey")).as("c_custkey"),
          when(col("o_custkey") % 17 === 0 && col("o_custkey") % 7 =!= 0,
            lit("D")).otherwise(lit("U")).as("op"),
          col("o_orderkey").as("seq"),
          round(col("o_totalprice"), 2).as("c_acctbal"))
        RelationalOps.applyChangeSet(base, changes, Seq("c_custkey"))
      },
      Some("""
        WITH ch AS (
          SELECT CASE WHEN o_custkey % 7 = 0 THEN o_custkey + 1000000
                      ELSE o_custkey END AS c_custkey,
                 CASE WHEN o_custkey % 17 = 0 AND o_custkey % 7 <> 0
                      THEN 'D' ELSE 'U' END AS op,
                 o_orderkey AS seq,
                 round(o_totalprice, 2) AS c_acctbal
          FROM orders),
        latest AS (
          SELECT c_custkey, op, c_acctbal FROM (
            SELECT c_custkey, op, c_acctbal,
                   row_number() OVER (PARTITION BY c_custkey
                                      ORDER BY seq DESC) AS rn
            FROM ch) t WHERE rn = 1)
        SELECT c_custkey, c_acctbal FROM customer
        WHERE c_custkey NOT IN (SELECT c_custkey FROM latest)
        UNION ALL
        SELECT c_custkey, c_acctbal FROM latest WHERE op <> 'D'""")),

    // Incremental aggregate maintenance: per-custkey order stats kept as
    // two snapshots (a historical one and a delta slice) merged at
    // aggregate grain (RelationalOps.mergeAggSnapshots) — never
    // re-scanning raw history. The merge path must equal the direct
    // full-scan aggregate; the oracle replays the same two-snapshot
    // structure. Partial sums round to 2 decimals (exact for 2-decimal
    // money), so merge order cannot perturb the doubles.
    "incr_agg_merge" -> Entry(
      (s, dir) => {
        def snap(pred: org.apache.spark.sql.Column) =
          Tables.orders(s, dir).filter(pred)
            .groupBy(col("o_custkey"))
            .agg(count(lit(1)).as("n_orders"),
              round(sum(col("o_totalprice")), 2).as("sum_price"),
              min(col("o_totalprice")).as("min_price"),
              max(col("o_totalprice")).as("max_price"))
        RelationalOps.mergeAggSnapshots(
            Seq(snap(col("o_orderkey") % 10 =!= 0),
              snap(col("o_orderkey") % 10 === 0)),
            Seq("o_custkey"), "n_orders", Seq("sum_price"),
            Seq("min_price"), Seq("max_price"))
          .select(col("o_custkey"), col("n_orders"),
            round(col("sum_price"), 2).as("sum_price"),
            col("min_price"), col("max_price"))
      },
      Some("""
        WITH a AS (SELECT o_custkey, count(*) AS n_orders,
                          round(sum(o_totalprice), 2) AS sum_price,
                          min(o_totalprice) AS min_price,
                          max(o_totalprice) AS max_price
                   FROM orders WHERE o_orderkey % 10 <> 0
                   GROUP BY o_custkey),
        b AS (SELECT o_custkey, count(*) AS n_orders,
                     round(sum(o_totalprice), 2) AS sum_price,
                     min(o_totalprice) AS min_price,
                     max(o_totalprice) AS max_price
              FROM orders WHERE o_orderkey % 10 = 0
              GROUP BY o_custkey),
        u AS (SELECT * FROM a UNION ALL SELECT * FROM b)
        SELECT o_custkey, CAST(sum(n_orders) AS BIGINT) AS n_orders,
               round(sum(sum_price), 2) AS sum_price,
               min(min_price) AS min_price,
               max(max_price) AS max_price
        FROM u GROUP BY o_custkey""")),

    // File-skipping manifest: write a z-ordered slice, then derive the
    // per-file (n_rows, min/max) manifest a lake format maintains —
    // LayoutOps.fileStats, one narrow scan. METRIC-ENVELOPE ORACLE:
    // physical file names and the exact range-partition boundaries are
    // run-specific (RangePartitioner samples), but the manifest's
    // INVARIANTS are exact — file count equals the requested layout
    // width, per-file rows sum back to the dataset, the union of file
    // min/max envelopes is the dataset envelope, and the z-order
    // clustering actually narrows the mean per-file span on BOTH
    // dimensions (the whole point of the layout; a 1-D sort would leave
    // the second axis at full span). ZOrderSpec pins the sharper
    // numeric narrowing claims.
    "layout_file_stats" -> Entry(
      (s, dir) => {
        // write-once-per-JVM z-ordered slice (Scratch keys by absolute
        // dataset path + pid, cleans up at exit): the bench's warmup+N
        // passes time the manifest scan, not N redundant layout rewrites
        val out = graft.sources.Scratch.materialize("zmanifest", dir) {
          path =>
            graft.ops.LayoutOps.writeZOrdered(
              Tables.lineitem(s, dir).select(
                // spread BOTH low-cardinality keys over the full grid
                // (odd multipliers, coprime to 1024): at small SF the
                // raw keys stay below the grid width, leaving the high
                // bits constant — an axis the z-curve cannot cluster
                pmod(col("l_partkey") * 197, lit(1024)).as("x"),
                pmod(col("l_suppkey") * 131, lit(1024)).as("y"),
                col("l_orderkey")),
              col("x"), col("y"), bits = 10, numFiles = 8, path)
        }
        graft.ops.LayoutOps.fileStats(s, out, Seq("x", "y"))
          .agg(count(lit(1)).as("n_files"),
            sum(col("n_rows")).as("total_rows"),
            min(col("min_x")).as("min_x"), max(col("max_x")).as("max_x"),
            min(col("min_y")).as("min_y"), max(col("max_y")).as("max_y"),
            avg(col("max_x") - col("min_x")).as("_sx"),
            avg(col("max_y") - col("min_y")).as("_sy"))
          .select(col("n_files"), col("total_rows"),
            col("min_x"), col("max_x"), col("min_y"), col("max_y"),
            (col("_sx") <= lit(0.8) * (col("max_x") - col("min_x")))
              .as("span_narrowed_x"),
            (col("_sy") <= lit(0.8) * (col("max_y") - col("min_y")))
              .as("span_narrowed_y"))
      },
      Some("""
        SELECT CAST(8 AS BIGINT) AS n_files, count(*) AS total_rows,
               min((l_partkey * 197) % 1024) AS min_x,
               max((l_partkey * 197) % 1024) AS max_x,
               min((l_suppkey * 131) % 1024) AS min_y,
               max((l_suppkey * 131) % 1024) AS max_y,
               TRUE AS span_narrowed_x, TRUE AS span_narrowed_y
        FROM lineitem""")),

    // North-star layout op: Morton (z-order) clustering key over two
    // bucketized dimensions (graft.functions.InterleaveBits, the
    // Delta/Iceberg OPTIMIZE ZORDER discipline — see ops.LayoutOps for
    // the re-clustering writer). Oracle replays the interleave bit by
    // bit; the engine runs the codegen'd magic-number spread.
    "layout_zorder" -> Entry(
      (s, dir) => Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"),
          graft.ops.LayoutOps.zorderKey(
            pmod(col("l_partkey"), lit(1024)),
            pmod(col("l_suppkey"), lit(1024)), 10).as("zkey")),
      Some {
        val terms = (0 until 10).flatMap(i => Seq(
          s"(((x >> $i) & 1) << ${2 * i})",
          s"(((y >> $i) & 1) << ${2 * i + 1})")).mkString("\n             + ")
        s"""
        WITH c AS (SELECT l_orderkey, l_linenumber,
                          l_partkey % 1024 AS x, l_suppkey % 1024 AS y
                   FROM lineitem)
        SELECT l_orderkey, l_linenumber,
               $terms AS zkey
        FROM c"""
      })
  )
}

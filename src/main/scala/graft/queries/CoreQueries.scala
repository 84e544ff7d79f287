package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}
import graft.Tables
import graft.ops.{MetricOps, RelationalOps}
import graft.sources.{AvroSource, Scratch, Sources}
import Catalog.Entry

/** Scans, projections, filters, explodes, joins, sorts, set ops, datetime
  * scalars (SURVEY.md §2.1-§2.4, §2.7-§2.9).
  */
object CoreQueries {

  def defs: Map[String, Entry] = Map(

    // A1-A4 + T2 + F7: the flagship windowed-metrics slice — per 30 s
    // window and key: volume, avg, last-by-time, collected texts
    // (reference stream_join.py:401-428 / batch_to_mongo.py:201-238).
    "a1a4_windowed_metrics" -> Entry(
      (s, dir) => MetricOps.windowedMetricsWithTexts(
        Tables.events(s, dir), "30 seconds"),
      Some("""
        WITH e AS (
          SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value,
                 regexp_extract(props, '"k": ([0-9]+)', 1) AS k
          FROM events)
        SELECT time_bucket(INTERVAL '30 seconds', ts) AS window_start,
               event_type,
               count(*) AS n_events,
               round(sum(value), 2) AS sum_value,
               round(sum(value), 2) / count(*) AS avg_value,
               arg_max(value, ts) AS last_value,
               string_agg(k, ' ' ORDER BY k) AS props_keys
        FROM e GROUP BY 1, 2""")),

    // The flagship family's bounded-shuffle twin: texts capped to the 5
    // lexicographically-smallest keys per (window, key), enforced
    // map-side through the TopKPerGroup plan (bounded heaps, shuffle
    // carries only survivors) — the 100 TB posture for the one
    // non-combining aggregate; the uncapped entry above keeps the
    // reference's full-REPEATED-column semantics.
    "a1a4_windowed_metrics_capped" -> Entry(
      (s, dir) => MetricOps.windowedMetricsWithTextsCapped(
        Tables.events(s, dir), "30 seconds", maxTexts = 5),
      Some("""
        WITH e AS (
          SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value,
                 regexp_extract(props, '"k": ([0-9]+)', 1) AS k
          FROM events),
        g AS (SELECT time_bucket(INTERVAL '30 seconds', ts)
                       AS window_start,
                     event_type, count(*) AS n_events,
                     round(sum(value), 2) AS sum_value,
                     round(sum(value), 2) / count(*) AS avg_value,
                     arg_max(value, ts) AS last_value
              FROM e GROUP BY 1, 2),
        t AS (SELECT window_start, event_type, k FROM (
                SELECT time_bucket(INTERVAL '30 seconds', ts)
                         AS window_start,
                       event_type, k,
                       row_number() OVER (
                         PARTITION BY
                           time_bucket(INTERVAL '30 seconds', ts),
                           event_type
                         ORDER BY k) AS rn
                FROM e WHERE k IS NOT NULL)
              WHERE rn <= 5),
        ta AS (SELECT window_start, event_type,
                      string_agg(k, ' ' ORDER BY k) AS props_keys
               FROM t GROUP BY 1, 2)
        SELECT g.window_start, g.event_type, n_events, sum_value,
               avg_value, last_value,
               coalesce(props_keys, '') AS props_keys
        FROM g LEFT JOIN ta USING (window_start, event_type)""")),

    // J2 + T3: lambda-architecture batch join — two windowed metric legs,
    // full-outer on (window, key); a key present in either leg yields a row
    // (reference batch_to_mongo.py:235, CoGroupByKey stream_join.py:519-524).
    "j2_full_outer_metrics" -> Entry(
      (s, dir) => {
        val e = Tables.events(s, dir)
        def leg(types: Seq[String], n: String, sm: String) = e
          .filter(col("event_type").isin(types: _*))
          .groupBy(window(col("ts"), "30 minutes"), col("user_id"))
          .agg(count(lit(1)).as(n), round(sum(col("value")), 2).as(sm))
          .select(col("window.start").as("window_start"), col("user_id"),
            col(n), col(sm))
        MetricOps.fullOuterMetricsJoin(
          leg(Seq("click", "view"), "n_a", "sum_a"),
          leg(Seq("purchase", "error"), "n_b", "sum_b"),
          Seq("window_start", "user_id"))
      },
      Some("""
        WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, user_id, event_type,
                          value FROM events),
        a AS (SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start,
                     user_id, count(*) AS n_a, round(sum(value),2) AS sum_a
              FROM e WHERE event_type IN ('click','view') GROUP BY 1,2),
        b AS (SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start,
                     user_id, count(*) AS n_b, round(sum(value),2) AS sum_b
              FROM e WHERE event_type IN ('purchase','error') GROUP BY 1,2)
        SELECT coalesce(a.window_start, b.window_start) AS window_start,
               coalesce(a.user_id, b.user_id) AS user_id,
               n_a, sum_a, n_b, sum_b
        FROM a FULL OUTER JOIN b
          ON a.window_start = b.window_start AND a.user_id = b.user_id""")),

    // P2 + F18 + P4: JSON payload -> MAP<STRING,STRING> -> typed projection
    // with null-on-failure cast (batch_to_mongo.py:125-153).
    "p2_json_projection" -> Entry(
      (s, dir) => RelationalOps.parseJsonProps(Tables.events(s, dir))
        .select(col("event_id"), col("prop_k")),
      Some("""
        SELECT event_id,
               CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT)
                 AS prop_k
        FROM events""")),

    // P5-P8 + F13: not-null / IN-list / time-range predicates + projection
    // with per-row computed revenue (arima.py:441-460 filter placement).
    "p5p8_filter_project" -> Entry(
      (s, dir) => Tables.lineitem(s, dir)
        .filter(col("l_returnflag") === "R" &&
          col("l_linestatus").isin("O", "F") &&
          col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1999-01-01").cast("timestamp") &&
          col("l_quantity").isNotNull)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"),
          col("l_quantity"),
          (col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("revenue")),
      Some("""
        SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity,
               l_extendedprice * (1 - l_discount) AS revenue
        FROM lineitem
        WHERE l_returnflag = 'R' AND l_linestatus IN ('O','F')
          AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
          AND l_quantity IS NOT NULL""")),

    // E1/E2: wide->long unpivot via explode(array(struct)) — the
    // reference's price explode (batch_to_mongo.py:169-198).
    "e2_unpivot_measures" -> Entry(
      (s, dir) => RelationalOps.unpivot(Tables.lineitem(s, dir),
        Seq("l_orderkey", "l_linenumber"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")),
      Some("""
        SELECT l_orderkey, l_linenumber, measure, val FROM (
          SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
                 l_quantity AS val FROM lineitem
          UNION ALL
          SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
          FROM lineitem
          UNION ALL
          SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
          FROM lineitem
          UNION ALL
          SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem)
        WHERE val IS NOT NULL""")),

    // J3 + F16: left join + fill-zero (EDA bin join, Milestone4 cells 10/20).
    "j3_left_join_fill_zero" -> Entry(
      (s, dir) => {
        val per = Tables.orders(s, dir).groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_orders"),
            round(sum(col("o_totalprice")), 2).as("spend"))
        RelationalOps.leftJoinFillZero(
          Tables.customer(s, dir).select(col("c_custkey"), col("c_name")),
          per.withColumnRenamed("o_custkey", "c_custkey"),
          Seq("c_custkey"), Seq("n_orders", "spend"))
      },
      Some("""
        SELECT c.c_custkey, c.c_name,
               coalesce(n_orders, 0) AS n_orders,
               coalesce(spend, 0.0) AS spend
        FROM customer c LEFT JOIN (
          SELECT o_custkey, count(*) AS n_orders,
                 round(sum(o_totalprice), 2) AS spend
          FROM orders GROUP BY 1) o
        ON c.c_custkey = o.o_custkey""")),

    // J-star: multi-hop broadcast dimension join (lineitem ⋈ supplier ⋈
    // nation ⋈ region) — the small-dim joins Catalyst broadcasts
    // (SURVEY.md §2.4 note).
    "j_dim_star" -> Entry(
      (s, dir) => Tables.lineitem(s, dir)
        .join(broadcast(Tables.supplier(s, dir)),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, dir)),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_extendedprice")), 2).as("total_price")),
      Some("""
        SELECT r_name, n_name, count(*) AS n_items,
               round(sum(l_extendedprice), 2) AS total_price
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY 1, 2""")),

    // A1/A2/A6 + A8-lite: classic grouped aggregation with min/max.
    "a2a6_agg_pricing" -> Entry(
      (s, dir) => {
        val n = count(lit(1))
        Tables.lineitem(s, dir)
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(n.as("n_rows"),
            round(sum(col("l_quantity")), 2).as("sum_qty"),
            round(sum(col("l_extendedprice")), 2).as("sum_price"),
            (round(sum(col("l_extendedprice")), 2) / n).as("avg_price"),
            min(col("l_shipdate")).as("min_ship"),
            max(col("l_shipdate")).as("max_ship"))
      },
      Some("""
        SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_price,
               round(sum(l_extendedprice), 2) / count(*) AS avg_price,
               min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship
        FROM lineitem GROUP BY 1, 2""")),

    // A7/O3: value_counts + deterministic top-k (Milestone3 cells 22/28).
    "a7_top_users" -> Entry(
      (s, dir) => RelationalOps.topKByCount(Tables.events(s, dir),
        "user_id", 10),
      Some("""
        SELECT user_id, count(*) AS cnt FROM events
        GROUP BY 1 ORDER BY cnt DESC, user_id LIMIT 10""")),

    // O1/O3: global sort + top-n with tiebreaker (arima.py:63 ORDER BY).
    "o1_orders_topn" -> Entry(
      (s, dir) => Tables.orders(s, dir)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(25)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderdate")),
      Some("""
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
        FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""")),

    // U1: union-all of conformed dimensions (pd.concat, Milestone4 cell 5).
    "u1_union_dims" -> Entry(
      (s, dir) => {
        val c = Tables.customer(s, dir)
          .select(col("c_nationkey").as("nationkey"),
            lit("customer").as("side"))
        val p = Tables.supplier(s, dir)
          .select(col("s_nationkey").as("nationkey"),
            lit("supplier").as("side"))
        RelationalOps.unionByName(Seq(c, p))
          .join(broadcast(Tables.nation(s, dir)),
            col("nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"), col("side"))
          .agg(count(lit(1)).as("n"))
      },
      Some("""
        SELECT n_name, side, count(*) AS n FROM (
          SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
          UNION ALL
          SELECT s_nationkey, 'supplier' FROM supplier) u
        JOIN nation ON nationkey = n_nationkey
        GROUP BY 1, 2""")),

    // F4/F6/F8: datetime scalar family — truncation, formatting, epoch
    // millis (batch_to_mongo.py:154-165, Milestone4 cells 10/20).
    "f4f8_datetime" -> Entry(
      (s, dir) => Tables.events(s, dir)
        .select(col("event_id"),
          date_trunc("hour", col("ts")).as("ts_hour"),
          date_format(col("ts"), "yyyy-MM-dd").as("day_str"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_str"),
          unix_millis(col("ts")).as("epoch_ms")),
      Some("""
        SELECT event_id,
               date_trunc('hour', CAST(ts AS TIMESTAMP)) AS ts_hour,
               strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day_str,
               strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_str,
               epoch_ms(CAST(ts AS TIMESTAMP)) AS epoch_ms
        FROM events""")),

    // S3: Avro batch archive roundtrip — write lineitem's first lines as
    // snappy Avro container files (the reference's Pub/Sub->GCS archive
    // shape, batch_to_mongo.py:364), read them back through the splittable
    // AvroKeyInputFormat source, and aggregate. The oracle aggregates the
    // parquet table directly, so a hash match proves the Avro encode/decode
    // (longs, doubles, strings, timestamp-micros) is lossless end-to-end.
    "s3_avro_roundtrip" -> Entry(
      (s, dir) => {
        // write-once-per-JVM scratch archive (Scratch keys it by absolute
        // dataset path + pid and cleans up at exit): repeated invocations
        // under a warmup+N-pass bench loop time the READ path, not N
        // redundant full-archive rewrites
        val archive = Scratch.materialize("avro", dir) { path =>
          AvroSource.write(
            Tables.lineitem(s, dir).filter(col("l_linenumber") === 1),
            new java.io.File(path, "lineitem").toString)
        } + "/lineitem"
        AvroSource.read(s, archive)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("l_extendedprice")), 2).as("revenue"),
            round(sum(col("l_quantity")), 2).as("qty"),
            max(col("l_shipdate")).as("last_ship"))
      },
      Some("""
        SELECT l_returnflag, count(*) AS n,
               round(sum(l_extendedprice), 2) AS revenue,
               round(sum(l_quantity), 2) AS qty,
               max(CAST(l_shipdate AS TIMESTAMP)) AS last_ship
        FROM lineitem WHERE l_linenumber = 1
        GROUP BY 1""")),

    // S9: ORC interchange roundtrip — same write-once Scratch discipline
    // as the Avro entry (the bench loop times the READ path, not repeated
    // archive rewrites). Exercises Spark's native vectorized ORC
    // reader/writer end-to-end; the oracle replays the aggregate over the
    // identical rows from the parquet table.
    "s9_orc_roundtrip" -> Entry(
      (s, dir) => {
        val archive = Scratch.materialize("orc", dir) { path =>
          graft.sources.Sources.writeOrc(
            Tables.lineitem(s, dir).filter(col("l_linenumber") === 2),
            new java.io.File(path, "lineitem").toString)
        } + "/lineitem"
        graft.sources.Sources.orc(s, archive)
          .groupBy(col("l_linestatus"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("l_extendedprice")), 2).as("revenue"),
            round(sum(col("l_quantity")), 2).as("qty"),
            min(col("l_shipdate")).as("first_ship"))
      },
      Some("""
        SELECT l_linestatus, count(*) AS n,
               round(sum(l_extendedprice), 2) AS revenue,
               round(sum(l_quantity), 2) AS qty,
               min(CAST(l_shipdate AS TIMESTAMP)) AS first_ship
        FROM lineitem WHERE l_linenumber = 2
        GROUP BY 1""")),

    // S4: quarantining ingest end-to-end — a dirty JSON-lines archive
    // (clean file + file with malformed records + not-actually-gzip file,
    // the reference's validate-then-load shape, batch_to_mongo.py:60-106)
    // is read through the pre-scan + PERMISSIVE split, and BOTH sides are
    // aggregated in one plan: good-side count/sums prove the clean rows
    // survive byte-exact, bad-side count proves every malformed record
    // (and only those) was quarantined, and n_bad_files carries the
    // file-level report. The aggregate-only-on-either-side shape is
    // exactly what the raw-JSON-datasource variant of this read could not
    // run (corrupt-column-only pruning restriction — see Sources.scala).
    "s4_quarantine_stats" -> Entry(
      (s, dir) => {
        val fix = Scratch.materialize("jsonq", dir) { path =>
          val rows = Tables.documents(s, dir)
            .select(col("doc_id").as("id"), col("n_chars"))
            .filter(col("id") < 200).orderBy("id")
            .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
          val d = new java.io.File(path); d.mkdirs()
          def write(name: String, lines: Seq[String]): Unit = {
            val w = new java.io.PrintWriter(
              new java.io.File(d, name), "UTF-8")
            try lines.foreach(w.println) finally w.close()
          }
          write("clean.json", rows.filter(_._1 % 2 == 0)
            .map { case (i, n) => s"""{"id":$i,"nchars":$n}""" })
          // every odd id divisible by 3 becomes a truncated record
          write("mixed.json", rows.filter(_._1 % 2 == 1)
            .map { case (i, n) =>
              if (i % 3 == 0) s"""{"id":$i,"nchars":"""
              else s"""{"id":$i,"nchars":$n}""" })
          val gz = new java.io.FileOutputStream(
            new java.io.File(d, "corrupt.json.gz"))
          try gz.write("this is not a gzip stream".getBytes("UTF-8"))
          finally gz.close()
        }
        val schema = new StructType()
          .add("id", LongType).add("nchars", LongType)
        val (parsed, report) =
          Sources.jsonQuarantinedWithReport(s, schema, fix)
        val (good, bad) = Sources.splitQuarantine(parsed)
        good.agg(count(lit(1)).as("n_good"),
            sum(col("id")).as("sum_id"),
            sum(col("nchars")).as("sum_nchars"))
          .crossJoin(bad.agg(count(lit(1)).as("n_bad_records")))
          .withColumn("n_bad_files", lit(report.size.toLong))
      },
      Some("""
        WITH d AS (
          SELECT doc_id AS id, n_chars FROM documents WHERE doc_id < 200)
        SELECT
          (SELECT count(*) FROM d
             WHERE id % 2 = 0 OR id % 3 <> 0) AS n_good,
          (SELECT CAST(sum(id) AS BIGINT) FROM d
             WHERE id % 2 = 0 OR id % 3 <> 0) AS sum_id,
          (SELECT CAST(sum(n_chars) AS BIGINT) FROM d
             WHERE id % 2 = 0 OR id % 3 <> 0) AS sum_nchars,
          (SELECT count(*) FROM d
             WHERE id % 2 = 1 AND id % 3 = 0) AS n_bad_records,
          CAST(1 AS BIGINT) AS n_bad_files"""))
  )
}

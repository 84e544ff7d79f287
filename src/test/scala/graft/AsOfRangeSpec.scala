package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.{AsOfJoinOps, CorpusOps, SimilarityOps}

/** Semantics of the round-2 relational extensions: as-of join (union +
  * gaps-and-islands), banded range join (band edges included), mix
  * sampling (deterministic, stratified), group centroids (exact quantized
  * sums).
  */
class AsOfRangeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin picks most recent right value at or before left time") {
    val left = Seq(
      (1L, 7L, ts("2024-01-01 10:00:30"), 5.0),
      (2L, 7L, ts("2024-01-01 10:02:00"), 6.0),
      (3L, 8L, ts("2024-01-01 10:00:10"), 7.0) // key 8: no right rows
    ).toDF("event_id", "user_id", "ts", "value")
    val right = Seq(
      (101L, 7L, ts("2024-01-01 10:00:00"), 100.0),
      (102L, 7L, ts("2024-01-01 10:02:00"), 200.0) // same instant as left 2
    ).toDF("event_id", "user_id", "ts", "value")
      .select($"user_id", $"ts", $"event_id", $"value")

    val out = AsOfJoinOps.asofJoin(left, right, "user_id", "ts",
        "event_id", "value").collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[Any]("asof_value"))).toMap
    assert(out(1L) === Some(100.0))
    assert(out(2L) === Some(200.0)) // "at or before" includes same instant
    assert(out(3L) === None)
  }

  test("rangeJoinCount counts right rows in (t, t+range], zero-filled") {
    val left = Seq(
      (1L, 7L, ts("2024-01-01 10:00:00")),
      (2L, 7L, ts("2024-01-01 11:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (7L, ts("2024-01-01 10:00:00"), 1.0),  // exactly at t: excluded
      (7L, ts("2024-01-01 10:10:00"), 2.0),  // in range
      (7L, ts("2024-01-01 10:30:00"), 4.0),  // exactly t+range: included
      (7L, ts("2024-01-01 10:31:00"), 8.0)   // past range: excluded
    ).toDF("user_id", "ts", "value")

    val out = AsOfJoinOps.rangeJoinCount(left, right, "user_id", "ts",
        "event_id", "value", 1800).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Long]("n_follow"), r.getAs[Double]("sum_follow"))).toMap
    assert(out(1L) === ((2L, 6.0)))
    assert(out(2L) === ((0L, 0.0)))
  }

  test("mixSample is deterministic, stratified, and roughly proportional") {
    val docs = (0 until 2000).map(i =>
      (i.toLong, if (i % 2 == 0) "en" else "zh")).toDF("doc_id", "lang")
    val fr = Map("en" -> 0.8, "zh" -> 0.2)
    val s1 = CorpusOps.mixSample(docs, "lang", "doc_id", fr).collect()
    val s2 = CorpusOps.mixSample(
      docs.repartition(7), "lang", "doc_id", fr).collect()
    assert(s1.map(_.getLong(0)).sorted.toSeq ===
      s2.map(_.getLong(0)).sorted.toSeq) // layout-independent
    val byLang = s1.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(math.abs(byLang("en") - 800) < 100)
    assert(math.abs(byLang("zh") - 200) < 60)
  }

  test("mixSample keeps a whole stratum at frac >= 1.0") {
    val docs = (0 until 500).map(i =>
      (i.toLong, if (i % 2 == 0) "en" else "zh")).toDF("doc_id", "lang")
    val out = CorpusOps.mixSample(docs, "lang", "doc_id",
      Map("en" -> 1.0), defaultFrac = 0.0).collect()
    assert(out.length === 250, "frac=1.0 must keep every row, " +
      "including ids whose hash prefix is ffffffff")
    assert(out.forall(_.getString(1) === "en"))
    // and defaultFrac = 1.0 keeps everything
    assert(CorpusOps.mixSample(docs, "lang", "doc_id",
      Map.empty, defaultFrac = 1.0).count() === 500L)
  }

  test("asofJoin carries non-numeric values in their native type") {
    val left = Seq(
      (1L, 7L, ts("2024-01-01 10:00:30")),
      (2L, 8L, ts("2024-01-01 10:00:10"))
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (101L, 7L, ts("2024-01-01 10:00:00"), "hello")
    ).toDF("event_id", "user_id", "ts", "label")
      .select($"user_id", $"ts", $"event_id", $"label")
    val out = AsOfJoinOps.asofJoin(left, right, "user_id", "ts",
      "event_id", "label")
    assert(out.schema("asof_value").dataType ===
      org.apache.spark.sql.types.StringType)
    val m = out.collect().map(r => r.getAs[Long]("event_id") ->
      Option(r.getAs[String]("asof_value"))).toMap
    assert(m(1L) === Some("hello"))
    assert(m(2L) === None)
  }

  test("weightedSample: k per stratum, layout-independent, skips w<=0") {
    val docs = (0 until 600).map(i => (i.toLong,
      if (i % 2 == 0) "en" else "zh",
      if (i == 17) 0L else (i % 50) + 1L)).toDF("doc_id", "lang", "w")
    val s1 = CorpusOps.weightedSample(docs, "lang", "doc_id", "w", 25)
      .collect()
    val s2 = CorpusOps.weightedSample(docs.repartition(7), "lang",
      "doc_id", "w", 25).collect()
    assert(s1.map(_.getLong(0)).sorted.toSeq ===
      s2.map(_.getLong(0)).sorted.toSeq)
    val byLang = s1.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(byLang === Map("en" -> 25, "zh" -> 25))
    assert(!s1.map(_.getLong(0)).contains(17L), "w=0 row must be excluded")
    // weight bias: a stratum where one doc has overwhelming weight
    val biased = (0 until 200).map(i =>
      (i.toLong, "x", if (i == 7) 1000000L else 1L)).toDF(
      "doc_id", "lang", "w")
    val picked = CorpusOps.weightedSample(biased, "lang", "doc_id", "w", 5)
      .collect().map(_.getLong(0))
    assert(picked.contains(7L), "heavyweight doc should be sampled")
  }

  test("quantizeInt8 emits per-vector scale + int8 codes, 0-safe") {
    val vecs = Seq(
      (1L, Array(127.0f, -64.0f, 1.0f)),
      (2L, Array(0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = SimilarityOps.quantizeInt8(vecs).collect()
      .map(r => r.getLong(0) ->
        (r.getDouble(1), r.getString(2))).toMap
    assert(out(1L) === ((1.0, "127,-64,1")))
    assert(out(2L) === ((0.0, "0,0")))
  }

  test("groupCentroids computes exact quantized per-dim means") {
    val vecs = Seq(
      (0, Array(1.0f, -2.0f)),
      (0, Array(3.0f, 4.0f)),
      (1, Array(0.5f, 0.25f))
    ).toDF("label", "embedding")
    val out = SimilarityOps.groupCentroids(vecs, "label").collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getAs[Long]("n_vecs"), r.getAs[Double]("centroid"))).toMap
    assert(out((0, 0)) === ((2L, 2.0)))
    assert(out((0, 1)) === ((2L, 1.0)))
    assert(out((1, 0)) === ((1L, 0.5)))
    assert(out((1, 1)) === ((1L, 0.25)))
  }

  test("asofJoin plans a single shuffle (window), no join operator") {
    val left = Seq((1L, 7L, ts("2024-01-01 10:00:30"), 5.0))
      .toDF("event_id", "user_id", "ts", "value")
    val right = Seq((101L, 7L, ts("2024-01-01 10:00:00"), 100.0))
      .toDF("event_id", "user_id", "ts", "value")
      .select($"user_id", $"ts", $"event_id", $"value")
    val plan = AsOfJoinOps.asofJoin(left, right, "user_id", "ts",
      "event_id", "value").queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"expected join-free plan:\n$plan")
  }
}

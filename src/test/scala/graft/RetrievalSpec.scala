package graft

import org.apache.spark.sql.functions._
import graft.ops.RetrievalOps

/** BM25 scoring + reciprocal-rank fusion semantics. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "fast fast fast join"),
    (2L, "fast join"),
    (3L, "slow scan merge"),
    (4L, "join join join join join join join join"),
    (5L, "")
  ).toDF("doc_id", "text")

  test("bm25 ranks higher-tf docs first and respects length normalization") {
    val scored = RetrievalOps.bm25Scored(docs, Seq("fast"))
      .orderBy($"bm25".desc).collect()
    // doc 1 has tf=3; doc 2 tf=1 but shorter; docs 3/4/5 tf=0 -> score 0
    assert(scored.head.getLong(0) === 1L)
    assert(scored(1).getLong(0) === 2L)
    assert(scored.drop(2).forall(_.getDouble(2) === 0.0))
  }

  test("bm25 length normalization penalizes long docs at equal tf") {
    val byId = RetrievalOps.bm25Scored(docs, Seq("join"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // doc 2 (2 words, tf=1) must outscore doc 1 (4 words, tf=1) — shorter
    // doc, same tf; and doc 4 (tf=8 but 8 words) still beats both
    assert(byId(2L) > byId(1L))
    assert(byId(4L) > byId(2L))
  }

  test("bm25 idf downweights common terms") {
    // "join" appears in 3/5 docs, "merge" in 1/5: at equal tf and dl the
    // rarer term contributes more
    val m = RetrievalOps.bm25Scored(
      Seq((1L, "join x"), (2L, "merge x"), (3L, "join y"),
        (4L, "join z"), (5L, "w q")).toDF("doc_id", "text"),
      Seq("join", "merge"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(m(2L) > m(1L))
  }

  test("bm25TopK truncates with deterministic id tiebreaks") {
    val top = RetrievalOps.bm25TopK(docs, Seq("fast", "join"), 3).collect()
    assert(top.length === 3)
    assert(top.map(_.getInt(2)).toSeq === Seq(1, 2, 3))
    // ranks follow (score desc, id asc)
    val scores = top.map(_.getDouble(1))
    assert(scores.sliding(2).forall { case Array(a, b) => a >= b })
  }

  test("bm25 counts terms with non-word edge characters (\\b would " +
       "never match them)") {
    val code = Seq(
      (1L, "i love c++ dearly"),
      (2L, "c+++ is not c++ wait yes it is c++"),
      (3L, "plain prose only")).toDF("doc_id", "text")
    val byId = RetrievalOps.bm25Scored(code, Seq("c++"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(byId(1L) > 0.0, "term at word boundary must count")
    assert(byId(2L) > 0.0)
    assert(byId(3L) === 0.0)
  }

  test("rrfFuse sums reciprocal ranks over present lists only") {
    val a = Seq((10L, 1), (20L, 2)).toDF("id", "rnk")
    val b = Seq((20L, 1), (30L, 2)).toDF("id", "rnk")
    val out = RetrievalOps.rrfFuse(Seq("a" -> a, "b" -> b), 60)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), Option(r.get(2)), Option(r.get(3)))).toMap
    val e = (r: Int) => 1.0 / (60.0 + r)
    assert(math.abs(out(20L)._1 - BigDecimal(e(2) + e(1))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(out(10L)._2 === Some(1) && out(10L)._3 === None)
    assert(out(30L)._2 === None && out(30L)._3 === Some(2))
    // doc in both lists outranks docs in one list at the same ranks
    assert(out(20L)._1 > out(10L)._1 && out(20L)._1 > out(30L)._1)
  }
}

package graft

/** Pins the boundedconst word-encoding invariants that the
  * catalog-facing CC exponents rest on (SCALE.md §r17): the fixture
  * claim "row basis IS byte basis" holds only while every token is
  * exactly 4 bytes, every (copy, word) pair maps to a distinct token,
  * and the encoded doc length depends on nothing but the word count.
  * The /tmp census (avg 269.70 B/doc identical at ×10/×30/×300) is the
  * end-to-end check; this spec is the in-tree one that fails the build
  * if the encoder drifts.
  */
class ScaleUpSpec extends SparkSpec {

  test("constToken is 4 chars for every value in the token space and " +
      "injective across (copy, rank)") {
    // exhaustive over a realistic vocab x a factor-300 copy range,
    // plus the space boundary
    val v = 31
    val seen = new scala.collection.mutable.HashSet[String]
    for (copy <- 0 until 300; rank <- 0 until v) {
      val t = ScaleUp.constToken(copy, v, rank)
      assert(t.length == 4, s"token $t for ($copy,$rank)")
      assert(seen.add(t), s"token collision at ($copy,$rank): $t")
    }
    val last = ScaleUp.constToken(
      ((ScaleUp.ConstTokenSpace - 1) / v).toInt, v,
      ((ScaleUp.ConstTokenSpace - 1) % v).toInt)
    assert(last == "zzzz", s"space boundary encodes to $last")
  }

  test("constEncode output bytes depend only on the word count — " +
      "identical across copies and independent of source word lengths") {
    val rank = Map("a" -> 0, "bb" -> 1, "ccccc" -> 2, "dddddddd" -> 3)
    val short = "a bb a"
    val long = "dddddddd ccccc bb"
    for (copy <- Seq(0, 1, 299)) {
      val es = ScaleUp.constEncode(short, copy, rank)
      val el = ScaleUp.constEncode(long, copy, rank)
      assert(es.length == 3 * 5 - 1 && el.length == 3 * 5 - 1,
        s"copy $copy: ${es.length}/${el.length}")
    }
    // word bijection within a copy: same word -> same token,
    // different words -> different tokens
    val e = ScaleUp.constEncode("a bb a ccccc", 7, rank).split(" ")
    assert(e(0) == e(2) && Set(e(0), e(1), e(3)).size == 3)
    // cross-copy disjoint: the same word never shares a token
    assert(ScaleUp.constEncode("a", 1, rank) !=
      ScaleUp.constEncode("a", 2, rank))
  }

  test("constEncode treats an EMPTY word from a double space as an " +
      "ordinary vocabulary entry — widened to a full 4-char token, " +
      "keeping the 5·words − 1 byte invariant (not passed through)") {
    val rank = Map("a" -> 0, "" -> 1, "b" -> 2)
    val e = ScaleUp.constEncode("a  b", 5, rank)
    val toks = e.split(" ", -1)
    // "a  b" splits (keep-empties) to ["a", "", "b"]: 3 words, and the
    // middle token is the encoding of "" — NOT an empty string
    assert(toks.length == 3, s"encoded as $e")
    assert(toks(1) == ScaleUp.constToken(5, 3, 1), s"empty word -> ${toks(1)}")
    assert(e.length == 3 * 5 - 1, s"byte invariant broke: ${e.length}")
  }

  test("constVocabRank's 36^4 token-space guard fires on an over-vocab " +
      "input BEFORE the driver-side collect materializes the word list") {
    import spark.implicits._
    // tiny vocabulary x huge factor overflows the space without needing
    // a large input: 3 words x 600000 copies > 36^4 = 1679616
    val docs = Seq("w0 w1", "w2").toDF("text")
    val ex = intercept[IllegalArgumentException] {
      ScaleUp.constVocabRank(docs, 600000)
    }
    assert(ex.getMessage.contains("exceeds the 4-char base-36 token space"),
      ex.getMessage)
    assert(ex.getMessage.contains("vocabulary 3 x factor 600000"),
      ex.getMessage)
    // in-range passes and ranks sorted: "" absent here, plain 3 words
    val rank = ScaleUp.constVocabRank(docs, 10)
    assert(rank == Map("w0" -> 0, "w1" -> 1, "w2" -> 2))
  }
}

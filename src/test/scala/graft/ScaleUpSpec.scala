package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the boundedconst word-encoding invariants that the
  * catalog-facing CC exponents rest on (SCALE.md §r17): the fixture
  * claim "row basis IS byte basis" holds only while every token is
  * exactly 4 bytes, every (copy, word) pair maps to a distinct token,
  * and the encoded doc length depends on nothing but the word count.
  * The /tmp census (avg 269.70 B/doc identical at ×10/×30/×300) is the
  * end-to-end check; this spec is the in-tree one that fails the build
  * if the encoder drifts.
  */
class ScaleUpSpec extends AnyFunSuite {

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
}

package graft

import org.apache.spark.sql.functions._
import graft.ops.{RelationalOps, StatsOps, TextOps}

/** Unit coverage for ops otherwise exercised only via the oracle catalog. */
class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  test("parseJsonProps extracts typed map values, null on garbage (P2/P4)") {
    val df = Seq((1L, """{"k": 42}"""), (2L, "not json"), (3L, null))
      .toDF("id", "props")
    val out = RelationalOps.parseJsonProps(df).collect()
      .map(r => r.getAs[Long]("id") ->
        Option(r.getAs[java.lang.Long]("prop_k")).map(_.longValue)).toMap
    assert(out(1L) === Some(42L))
    assert(out(2L) === None)
    assert(out(3L) === None)
  }

  test("topKByCount is deterministic under count ties (A7/O3)") {
    val df = (1 to 30).map(i => i % 10).toDF("k") // all counts equal 3
    val out = RelationalOps.topKByCount(df, "k", 5).collect()
      .map(_.getAs[Int]("k")).toSeq
    assert(out === Seq(0, 1, 2, 3, 4)) // tiebreak on key ascending
  }

  test("languageId scores marker words with lexicographic tiebreak") {
    val df = Seq(
      (1L, "the cat and the dog of the house"), // en markers
      (2L, "el gato y la casa de madera"),      // es markers
      (3L, "xyzzy plugh"))                      // no markers: all-zero tie
      .toDF("doc_id", "text")
    val out = TextOps.languageId(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("lang_pred")).toMap
    assert(out(1L) === "en")
    assert(out(2L) === "es")
    assert(out(3L) === "de") // zero-score tie -> first lexicographic lang
  }

  test("qualityScore stays in [0,1] and rewards clean prose") {
    val df = Seq(
      (1L, "the quick brown fox jumps over a lazy dog in the sunny park " +
        "and then it runs to the river bank for a drink of water"),
      (2L, "!!! ??? ;;; ..."), // punctuation soup
      (3L, "x"))               // too short
      .toDF("doc_id", "text")
    val out = TextOps.qualityScore(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("quality_score")).toMap
    out.values.foreach(q => assert(q >= 0.0 && q <= 1.0))
    assert(out(1L) > out(2L))
    assert(out(1L) > out(3L))
  }

  test("tokenCounts: whitespace vs BPE-ish counts (north-star)") {
    val out = TextOps.tokenCounts(
      Seq((1L, "hello world, it's 42 degrees")).toDF("doc_id", "text"))
      .collect().head
    assert(out.getAs[Int]("ws_tokens") === 5)
    // hello|world|,|it|'|s|42|degrees = 8 BPE-ish pieces
    assert(out.getAs[Int]("bpe_ish_tokens") === 8)
  }

  test("piiScrub redacts emails/phones/numbers and counts them") {
    val df = Seq(
      (1L, "mail me at a.user+x@example.co.uk or call +1 (555) 123-4567"),
      (2L, "ticket 123456 is open"), // 6 digits: <NUM>; 9+ digit runs
                                     // match the phone pattern instead
      (3L, "clean text only")
    ).toDF("doc_id", "text")
    val out = graft.ops.TextOps.piiScrub(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_emails"), r.getAs[Int]("n_phones"),
          r.getAs[String]("text_scrubbed"))).toMap
    assert(out(1L)._1 === 1)
    assert(out(1L)._2 === 1)
    assert(out(1L)._3.contains("<EMAIL>") && out(1L)._3.contains("<PHONE>"))
    assert(!out(1L)._3.contains("example.co.uk"))
    assert(out(2L)._3 === "ticket <NUM> is open")
    assert(out(3L)._3 === "clean text only")
  }

  test("shareOfRows computes exact predicate means (A9/A18)") {
    val df = Seq(("g", 1), ("g", 2), ("g", 3), ("g", 4)).toDF("k", "v")
    val out = StatsOps.shareOfRows(df, "k",
      Seq("share_even" -> (col("v") % 2 === 0))).collect().head
    assert(out.getAs[Double]("share_even") === 0.5)
    assert(out.getAs[Long]("n_rows") === 4L)
  }

  test("unigramLogProb: common-token docs outscore rare/OOV docs") {
    val df = Seq(
      (1L, "a a b"),   // top-vocab tokens only
      (2L, "c"),       // OOV under topV=2 (a:2, b:1 win the cut)
      (3L, "a a a"))   // most probable content
      .toDF("doc_id", "text")
    val out = TextOps.unigramLogProb(df, topV = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(out(1L)._1 === 3L && out(2L)._1 === 1L)
    // hand check doc 1: corpus tokens a,a,b,c,a,a,a -> counts a:5 b:1
    // c:1; top-2 vocab = a, b; total=7, v=2, denom=10
    // qlp(a)=round(ln(6/10)*1e6)=-510826, qlp(b)=round(ln(2/10)*1e6)
    // =-1609438, OOV=round(ln(1/10)*1e6)=-2302585
    val d1 = (2.0 * -510826 + -1609438) / 1e6 / 3
    assert(math.abs(out(1L)._2 -
      BigDecimal(d1).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble) < 1e-9)
    assert(out(3L)._2 > out(1L)._2)   // pure-a beats a,a,b
    assert(out(1L)._2 > out(2L)._2)   // vocab beats OOV
  }

  test("snapshotDiff classifies added/removed/changed/unchanged") {
    val before = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, null))
      .toDF("k", "v")
    val after = Seq((2L, "b"), (3L, "C"), (4L, null), (5L, "e"))
      .toDF("k", "v")
    val m = RelationalOps.snapshotDiff(before, after, "k", Seq("v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m === Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed",
      4L -> "unchanged", 5L -> "added"))
    // NULL never collides with any literal (type-prefixed hashing): a
    // null flipping to a single space is a real change
    val m2 = RelationalOps.snapshotDiff(
      Seq((1L, null: String), (2L, " ")).toDF("k", "v"),
      Seq((1L, " "), (2L, null: String)).toDF("k", "v"),
      "k", Seq("v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m2 === Map(1L -> "changed", 2L -> "changed"))
  }

  test("weightedQuantile picks the cumulative-weight threshold value") {
    // values 1..4 with weights 1,1,6,2 (total 10): cum = 1,2,8,10
    // median (q=0.5): first value with cum >= 5 -> 3
    // q=0.9: first cum >= 9 -> 4; q=0.1: first cum >= 1 -> 1
    val df = Seq(("g", 1.0, 1.0), ("g", 2.0, 1.0), ("g", 3.0, 6.0),
      ("g", 4.0, 2.0)).toDF("k", "v", "w")
    def wq(q: Double) = StatsOps.weightedQuantile(df, "k", "v", "w", q)
      .collect().head.getDouble(1)
    assert(wq(0.5) === 3.0)
    assert(wq(0.9) === 4.0)
    assert(wq(0.1) === 1.0)
    // duplicate values merge their weights before the running sum
    val dup = Seq(("g", 5.0, 1.0), ("g", 5.0, 1.0), ("g", 9.0, 1.0))
      .toDF("k", "v", "w")
    assert(StatsOps.weightedQuantile(dup, "k", "v", "w", 0.5)
      .collect().head.getDouble(1) === 5.0)
  }

  test("bigramLogProb matches the hand-built interpolated model, " +
       "single-word docs score null") {
    // corpus: unigrams a:3 b:3 c:1 z:1 (total 8); bigrams "a b":3,
    // "b a":1, "b c":1
    val docs = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "z"))
      .toDF("doc_id", "text")
    val out = TextOps.bigramLogProb(docs, topV = 20, topB = 40)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    // independent reimplementation of the quantized model (topV/topB
    // cover everything here, so no backoff fires)
    val denom = (8 + 4 + 1).toDouble
    def pu(c: Long) = (c + 1).toDouble / denom
    def q(p: Double) = math.round(math.log(p) * 1e6)
    val qab = q(0.5 * (3.0 / 3) + 0.5 * pu(3)) // p(b|a), a appears 3x
    val qba = q(0.5 * (1.0 / 3) + 0.5 * pu(3))
    val qbc = q(0.5 * (1.0 / 3) + 0.5 * pu(1))
    def avg(qs: Seq[Long]) = (qs.sum.toDouble / 1e6) / qs.length
    assert(out(1L) === ((3L, Some(avg(Seq(qab, qba, qab))))))
    assert(out(2L) === ((2L, Some(avg(Seq(qab, qbc))))))
    assert(out(3L) === ((0L, None))) // no bigram to score
  }

  test("bigramLogProb backs off to the unigram (then OOV) tier when the " +
       "bigram or token misses the truncated model") {
    val docs = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "z"))
      .toDF("doc_id", "text")
    // topV=1 keeps only "a" (count ties break lexicographically);
    // topB=1 keeps only "a b"
    val out = TextOps.bigramLogProb(docs, topV = 1, topB = 1)
      .collect().map(r => r.getLong(0) ->
        Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    val denom = (8 + 1 + 1).toDouble
    def pu(c: Long) = (c + 1).toDouble / denom
    def q(p: Double) = math.round(math.log(p) * 1e6)
    val qab = q(0.5 * (3.0 / 3) + 0.5 * pu(0)) // w2=b is OOV in topV=1
    val qToA = q(0.5 * pu(3))                  // backoff tier: w2="a"
    val qOov = q(0.5 * pu(0))                  // OOV tier: w2 not in topV
    def avg(qs: Seq[Long]) = (qs.sum.toDouble / 1e6) / qs.length
    // doc1 bigrams: "a b"(model), "b a"(backoff w2=a), "a b"(model)
    assert(out(1L) === Some(avg(Seq(qab, qToA, qab))))
    // doc2 bigrams: "a b"(model), "b c"(OOV tier)
    assert(out(2L) === Some(avg(Seq(qab, qOov))))
  }

  test("hashEmbed: md5-bucketed tf, L2-normalized, long-form sparse") {
    import spark.implicits._
    val docs = Seq((1L, "a a b"), (2L, "")).toDF("doc_id", "text")
    def bucket(tok: String, dim: Int): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
        .substring(0, 8)
      java.lang.Long.parseLong(hex, 16) % dim
    }
    val out = TextOps.hashEmbed(docs, dim = 64).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("dim_idx")) ->
        r.getAs[Double]("weight")).toMap
    val (ba, bb) = (bucket("a", 64), bucket("b", 64))
    assert(ba !== bb, "fixture tokens must not collide at dim 64")
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // tf(a)=2, tf(b)=1, norm = sqrt(5)
    assert(out((1L, ba)) === r6(2.0 / math.sqrt(5.0)))
    assert(out((1L, bb)) === r6(1.0 / math.sqrt(5.0)))
    // empty doc emits no rows
    assert(!out.keySet.exists(_._1 == 2L))
    assert(out.size === 2)
  }

  test("hashTfIdf: shared-bucket terms downweight vs doc-unique terms " +
       "(smooth idf), quantized-long norms") {
    import spark.implicits._
    val docs = Seq((1L, "a b"), (2L, "a c")).toDF("doc_id", "text")
    def bucket(tok: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
        .substring(0, 8)
      java.lang.Long.parseLong(hex, 16) % 64
    }
    val (ba, bb, bc) = (bucket("a"), bucket("b"), bucket("c"))
    assert(Set(ba, bb, bc).size === 3, "fixture buckets must not collide")
    val out = TextOps.hashTfIdf(docs, dim = 64).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("dim_idx")) ->
        r.getAs[Double]("weight")).toMap
    // idf(a) = ln(3/3)+1 = 1 (in both docs); idf(b) = ln(3/2)+1
    val qa = math.round(1.0 * 1.0 * 1e6)
    val qb = math.round((math.log(1.5) + 1.0) * 1e6)
    val nrm = math.sqrt((qa * qa + qb * qb).toDouble)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out((1L, ba)) === r6(qa / nrm))
    assert(out((1L, bb)) === r6(qb / nrm))
    assert(out((1L, bb)) > out((1L, ba)),
      "the corpus-rare term must carry more weight")
  }
}


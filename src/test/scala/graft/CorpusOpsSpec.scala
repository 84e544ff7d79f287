package graft

import org.apache.spark.sql.functions._
import graft.ops.CorpusOps

class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("token-budget packing assigns sequential chunks per group") {
    val docs = Seq(
      (1L, "s", 300L), (2L, "s", 300L), (3L, "s", 300L), (4L, "s", 50L),
      (5L, "t", 600L))
      .toDF("doc_id", "source", "tok")
    val out = CorpusOps.tokenBudgetChunks(docs, "doc_id", "source",
        $"tok", budget = 512)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("chunk_id")).toMap
    // running-before: doc1=0 -> chunk 0; doc2 starts at 300 -> chunk 0;
    // doc3 starts at 600 -> chunk 1; doc4 starts at 900 -> chunk 1
    assert(out(1L) === 0L && out(2L) === 0L)
    assert(out(3L) === 1L && out(4L) === 1L)
    assert(out(5L) === 0L) // independent group
  }

  test("packSequences: straddling docs span the right sequences, token " +
      "ranges tile the stream exactly, zero-token docs drop") {
    val docs = Seq(
      (1L, "s", 300L), (2L, "s", 300L), (3L, "s", 500L), (4L, "s", 0L),
      (5L, "s", 1200L), (6L, "t", 10L))
      .toDF("doc_id", "source", "tok")
    val out = CorpusOps.packSequences(docs, "doc_id", "source",
        $"tok", budget = 512)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("tok_start"), r.getAs[Long]("start_seq"),
          r.getAs[Long]("end_seq"), r.getAs[Long]("head_offset"))).toMap
    assert(!out.contains(4L)) // zero tokens -> no stream contribution
    // stream s: doc1 [0,300) seq 0; doc2 [300,600) straddles 0-1;
    // doc3 [600,1100) straddles 1-2; doc5 [1100,2300) spans 2-4
    assert(out(1L) === ((0L, 0L, 0L, 0L)))
    assert(out(2L) === ((300L, 0L, 1L, 300L)))
    assert(out(3L) === ((600L, 1L, 2L, 88L)))
    assert(out(5L) === ((1100L, 2L, 4L, 76L)))
    assert(out(6L) === ((0L, 0L, 0L, 0L))) // independent group
    // token ranges tile [0, total) per group with no gap or overlap
    val s = Seq(1L, 2L, 3L, 5L).map(out)
    assert(s.map(_._1) === Seq(0L, 300L, 600L, 1100L))
  }

  test("packManifest: sequences fill to budget (except each group's " +
      "last), fragments tile every doc exactly") {
    val docs = Seq(
      (1L, "s", 300L), (2L, "s", 300L), (3L, "s", 500L), (5L, "s", 1200L),
      (6L, "t", 10L))
      .toDF("doc_id", "source", "tok")
    val m = CorpusOps.packManifest(docs, "doc_id", "source", $"tok",
        budget = 512)
      .collect().map(r => (r.getAs[String]("source"),
        r.getAs[Long]("seq"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("slice_start"), r.getAs[Long]("slice_len")))
    // per (group, seq): fills are exactly 512 except the group's last
    m.groupBy(t => (t._1, t._2)).foreach { case ((src, seq), frags) =>
      val fill = frags.map(_._5).sum
      val lastSeq = m.filter(_._1 == src).map(_._2).max
      if (seq < lastSeq) assert(fill === 512L, s"$src seq $seq")
      else assert(fill > 0L && fill <= 512L)
    }
    // per doc: ordered slices tile [0, tokens) with no gap or overlap
    m.groupBy(_._3).foreach { case (id, frags) =>
      val slices = frags.sortBy(_._4).map(f => (f._4, f._4 + f._5)).toSeq
      assert(slices.head._1 === 0L)
      slices.sliding(2).foreach {
        case Seq((_, e), (s2, _)) => assert(e === s2, s"doc $id gap")
        case _ =>
      }
      val tok = Map(1L -> 300L, 2L -> 300L, 3L -> 500L, 5L -> 1200L,
        6L -> 10L)(id)
      assert(slices.last._2 === tok)
    }
    // straddling doc 5 ([1100,2300)) contributes to seqs 2,3,4
    assert(m.filter(_._3 == 5L).map(_._2).sorted.toSeq === Seq(2L, 3L, 4L))
  }

  test("epochShuffleShards: deterministic per salt, epochs independent, " +
      "shard_pos contiguous from 1") {
    val docs = (0L until 200L).map(i => Tuple1(i)).toSeq.toDF("doc_id")
    def run(salt: String) = CorpusOps.epochShuffleShards(
        docs, "doc_id", nShards = 4, epochSalt = salt)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("shard"), r.getAs[Long]("shard_pos"))).toMap
    val e1 = run("ep1")
    val e1b = run("ep1")
    val e2 = run("ep2")
    assert(e1 === e1b) // pure function of (salt, id)
    assert(e1 !== e2)  // a new epoch is a different permutation
    assert(e1.values.map(_._1).toSet === Set(0L, 1L, 2L, 3L))
    // positions are a contiguous 1..n ranking within each shard
    e1.values.groupBy(_._1).foreach { case (_, g) =>
      val pos = g.map(_._2).toSeq.sorted
      assert(pos === (1L to pos.size).toSeq)
    }
    // layout-independence: same assignment after repartition
    val e1c = CorpusOps.epochShuffleShards(
        docs.repartition(13), "doc_id", nShards = 4, epochSalt = "ep1")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("shard"), r.getAs[Long]("shard_pos"))).toMap
    assert(e1 === e1c)
  }

  test("deterministic split is stable and content-only") {
    val docs = Seq((1L, "alpha"), (2L, "beta"), (3L, "alpha"))
      .toDF("doc_id", "text")
    val out = CorpusOps.deterministicSplit(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert(out(1L) === out(3L)) // same text -> same split, id-independent
    assert(Set("train", "val", "test").contains(out(2L)))
  }

  test("normalizeText lowercases, strips punctuation, collapses spaces") {
    val out = Seq("Hello,   WORLD!!  123").toDF("t")
      .select(CorpusOps.normalizeText($"t").as("n"))
      .collect().head.getString(0)
    assert(out === "hello world 123")
  }

  test("windowChunks slides with overlap, short tail, skips empty docs") {
    val docs = Seq((1L, "abcdefghij"), (2L, ""), (3L, "xy"))
      .toDF("doc_id", "text")
    val out = CorpusOps.windowChunks(docs, "doc_id", "text",
        size = 5, stride = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    // doc 1 (n=10): starts 0,3,6,9 -> 4 windows, last two short-tailed
    assert(out((1L, 0L)) === "abcde")
    assert(out((1L, 1L)) === "defgh")
    assert(out((1L, 2L)) === "ghij")
    assert(out((1L, 3L)) === "j")
    assert(out((3L, 0L)) === "xy")
    assert(out.size === 5, "empty doc must emit no chunks")
    // overlap reconstruction: stride-aligned prefixes re-concatenate
    val rebuilt = (0L to 3L).map(i => out((1L, i)).take(3)).mkString
    assert(rebuilt === "abcdefghij")
  }

  test("repetitionSignals: exact dup fractions, nulls under n-gram order") {
    val docs = Seq(
      (1L, "a b a b a"),   // 5 words {a,b} -> dup 3/5; bigrams 4 {a b,b a} -> 2/4; trigrams 3 {aba,bab} -> 1/3
      (2L, "x"),           // single word: no 2/3-grams
      (3L, "p q r"),       // all distinct
      (4L, "")             // empty: filtered out
    ).toDF("doc_id", "text")
    val out = CorpusOps.repetitionSignals(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.keySet === Set(1L, 2L, 3L))
    assert(out(1L).getAs[Double]("dup_word_frac") === 1.0 - 2.0 / 5.0)
    assert(out(1L).getAs[Double]("dup_2gram_frac") === 1.0 - 2.0 / 4.0)
    assert(out(1L).getAs[Double]("dup_3gram_frac") === 1.0 - 2.0 / 3.0)
    assert(out(2L).isNullAt(out(2L).fieldIndex("dup_2gram_frac")))
    assert(out(2L).isNullAt(out(2L).fieldIndex("dup_3gram_frac")))
    assert(out(3L).getAs[Double]("dup_word_frac") === 0.0)
    assert(out(3L).getAs[Double]("dup_2gram_frac") === 0.0)
  }

  test("segmentDedup keeps first occurrence globally, reassembles text") {
    // seg size 2: doc1 = [a b][c d], doc2 = [a b][e f], doc3 = [c d]
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b e f"), (3L, "c d"))
      .toDF("doc_id", "text")
    val out = CorpusOps.segmentDedup(docs, "doc_id", "text", segWords = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("total_segs"), r.getAs[Long]("kept_segs"),
          r.getAs[String]("kept_text")))).toMap
    assert(out(1L) === ((2L, 2L, "a b c d")))  // first owner of both segs
    assert(out(2L) === ((2L, 1L, "e f")))      // "a b" already seen in doc1
    assert(out(3L) === ((1L, 0L, "")))         // fully duplicated, stays
  }

  test("paragraphDedup: natural-boundary units, first occurrence wins, " +
       "empty paragraphs are not dedup units") {
    val docs = Seq(
      (1L, "the cat sat\non the mat"),          // two paragraphs
      (2L, "the cat sat\n\nsomething new"),     // dup para + empty + new
      (3L, "on the mat"),                       // fully duplicated
      (4L, "\nthe cat sat\n"),                  // boundary artifacts only
      (5L, ""), (6L, null: String))             // degenerate docs survive
      .toDF("doc_id", "text")
    val out = CorpusOps.paragraphDedup(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("total_segs"), r.getAs[Long]("kept_segs"),
          r.getAs[String]("kept_text")))).toMap
    assert(out.keySet === Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(out(1L) === ((2L, 2L, "the cat sat\non the mat")))
    assert(out(2L) === ((2L, 1L, "something new")))
    assert(out(3L) === ((1L, 0L, "")))
    // doc4's only real paragraph is a dup of doc1's; the leading and
    // trailing newlines contribute no segments
    assert(out(4L) === ((1L, 0L, "")))
    assert(out(5L) === ((0L, 0L, "")))
    assert(out(6L) === ((0L, 0L, "")))
  }

  test("paragraphDedup: within-doc duplicate paragraphs collapse, order " +
       "of survivors is positional") {
    val docs = Seq((9L, "x y\nz\nx y\nw")).toDF("doc_id", "text")
    val r = CorpusOps.paragraphDedup(docs, "doc_id", "text").collect().head
    assert(r.getAs[Long]("total_segs") === 4L)
    assert(r.getAs[Long]("kept_segs") === 3L)
    assert(r.getAs[String]("kept_text") === "x y\nz\nw")
  }

  test("segmentDedup within-doc duplicate segments collapse too") {
    val docs = Seq((7L, "a b a b a")).toDF("doc_id", "text")
    // segs of 2: [a b][a b][a] -> keeps idx 0 and the short tail
    val r = CorpusOps.segmentDedup(docs, "doc_id", "text", segWords = 2)
      .collect().head
    assert(r.getAs[Long]("total_segs") === 3L)
    assert(r.getAs[Long]("kept_segs") === 2L)
    assert(r.getAs[String]("kept_text") === "a b a")
  }

  test("segmentDedup keeps empty- and null-text docs as zero-segment " +
       "rows (every doc survives)") {
    val docs = Seq((1L, "a b"), (2L, ""), (3L, null: String))
      .toDF("doc_id", "text")
    val out = CorpusOps.segmentDedup(docs, "doc_id", "text", segWords = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("total_segs"), r.getAs[Long]("kept_segs"),
          r.getAs[String]("kept_text")))).toMap
    assert(out.keySet === Set(1L, 2L, 3L))
    assert(out(1L) === ((1L, 1L, "a b")))
    assert(out(2L) === ((0L, 0L, "")))
    assert(out(3L) === ((0L, 0L, "")))
  }

  private def skewedDocs = {
    // 90/10 skew across two strata
    val rows = (1L to 90L).map(i => (i, "big")) ++
      (91L to 100L).map(i => (i, "small"))
    rows.toDF("doc_id", "lang")
  }

  test("temperatureRebalance: T=1 keeps the natural distribution (every " +
       "stratum gets the same keep fraction)") {
    val fracs = CorpusOps.temperatureRebalance(skewedDocs, "lang",
        "doc_id", temperature = 1.0, targetTotal = 50)
      .select("lang", "keep_frac").distinct().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Double]("keep_frac"))
      .toMap
    // alpha=1: q_l = target * n_l / (N * n_l) = target/N for every l
    assert(fracs("big") === 0.5 && fracs("small") === 0.5)
  }

  test("temperatureRebalance: higher T flattens toward uniform and caps " +
       "a small stratum at one epoch") {
    val plan = CorpusOps.temperatureRebalance(skewedDocs, "lang",
        "doc_id", temperature = 2.0, targetTotal = 60)
      .select("lang", "n_docs", "keep_frac").distinct().collect()
      .map(r => r.getAs[String]("lang") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Double]("keep_frac")))).toMap
    // weights sqrt(90):sqrt(10) = 3:1 -> targets 45:15; small stratum
    // holds only 10 docs, so its fraction caps at 1.0 (no duplication)
    assert(plan("big")._1 === 90L && plan("small")._1 === 10L)
    assert(plan("small")._2 === 1.0)
    val bigFrac = plan("big")._2
    // expected big take 45/90 = 0.5 -> strictly between natural (0.6 of
    // a 60-target at T=1) and uniform, and all 10 small docs survive
    assert(bigFrac > 0.4 && bigFrac < 0.6)
  }

  test("temperatureRebalance: a null stratum is a real stratum — rows " +
      "survive at their keep_frac instead of vanishing in the plan join") {
    val rows = (1L to 90L).map(i => (i, "big")) ++
      (91L to 100L).map(i => (i, null.asInstanceOf[String]))
    val out = CorpusOps.temperatureRebalance(rows.toDF("doc_id", "lang"),
        "lang", "doc_id", temperature = 1.0, targetTotal = 50)
      .select("lang", "keep_frac").distinct().collect()
      .map(r => Option(r.getAs[String]("lang")) ->
        r.getAs[Double]("keep_frac")).toMap
    // T=1: every stratum (including null) keeps target/N = 0.5
    assert(out(Some("big")) === 0.5 && out(None) === 0.5)
  }

  test("unimaxRebalance: waterfilling caps small strata and cascades " +
      "their unused share, keeps capped strata whole, layout-independent") {
    // a=10, b=20, c=100; budget 60: fair share 20 -> a caps at 10,
    // (60-10)/2=25 -> b caps at 20, c takes min(100, 30/1) = 30
    val rows = (1L to 10L).map(i => (i, "a")) ++
      (11L to 30L).map(i => (i, "b")) ++ (31L to 130L).map(i => (i, "c"))
    val df = rows.toDF("doc_id", "lang")
    val out = CorpusOps.unimaxRebalance(df, "lang", "doc_id",
      targetTotal = 60)
    val plan = out.select("lang", "n_docs", "quota", "keep_frac")
      .distinct().collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Double]("quota"),
          r.getAs[Double]("keep_frac")))).toMap
    assert(plan("a") === ((10L, 10.0, 1.0)))
    assert(plan("b") === ((20L, 20.0, 1.0)))
    assert(plan("c") === ((100L, 30.0, 0.3)))
    val kept = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // keep_frac 1.0 keeps a capped stratum WHOLE (no coin can lose rows)
    assert(kept("a") === 10L && kept("b") === 20L)
    assert(kept("c") > 0L && kept("c") < 100L)
    val re = CorpusOps.unimaxRebalance(df.repartition(13), "lang",
        "doc_id", targetTotal = 60)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(re.toSeq === out.select("doc_id").collect()
      .map(_.getLong(0)).sorted.toSeq)
  }

  test("exactStratifiedSample: exactly k per stratum, equal to the " +
       "naive per-stratum hash top-k, short strata keep everything") {
    val docs = ((1L to 200L).map(i => (i, "big")) ++
      (201L to 205L).map(i => (i, "tiny"))).toDF("doc_id", "lang")
    val out = CorpusOps.exactStratifiedSample(docs, "lang", "doc_id", 40)
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang === Map("big" -> 40L, "tiny" -> 5L))
    // parity with the naive formulation: rank the FULL stratum by the
    // same salted hash and cut at k
    val u32 = conv(substring(
      md5(concat_ws("|", lit("esample"), col("lang"),
        col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
      .orderBy(u32, col("doc_id"))
    val naive = docs.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= 40).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    val fast = out.select("doc_id").collect().map(_.getLong(0)).sorted
    assert(fast === naive)
    // layout invariance
    val re = CorpusOps.exactStratifiedSample(docs.repartition(17),
      "lang", "doc_id", 40).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(re === fast)
  }

  test("clusterSafeSplit: cluster members share the representative's " +
       "split, singletons split on their own id") {
    val docs = Seq((1L, "x"), (2L, "x dup"), (3L, "y"), (4L, "z"))
      .toDF("doc_id", "text")
    // docs 1+2 are one near-dup cluster (rep 1); 3 and 4 untouched
    val clusters = Seq((1L, 1L), (2L, 1L)).toDF("doc_id", "cluster_id")
    val out = CorpusOps.clusterSafeSplit(docs, clusters).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("rep_id"), r.getAs[String]("split")))).toMap
    assert(out(1L)._1 === 1L && out(2L)._1 === 1L)
    assert(out(1L)._2 === out(2L)._2,
      "near-dups must land in the same split")
    assert(out(3L)._1 === 3L && out(4L)._1 === 4L)
    // the split depends only on the representative id: doc 2's own
    // content hash plays no role
    val expected = { // md5("1") first two hex chars decide the cluster
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest("1".getBytes("UTF-8")).map("%02x".format(_)).mkString
        .substring(0, 2)
      if (h < "0a") "test" else if (h < "14") "val" else "train"
    }
    assert(out(1L)._2 === expected)
  }

  test("temperatureRebalance selection is deterministic across layouts") {
    val a = CorpusOps.temperatureRebalance(skewedDocs, "lang", "doc_id",
      2.0, 60).select("doc_id").collect().map(_.getLong(0)).sorted
    val b = CorpusOps.temperatureRebalance(skewedDocs.repartition(13),
      "lang", "doc_id", 2.0, 60)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("unimaxRebalance: a null stratum is a real stratum — it gets its " +
      "own count and quota through the native null-safe join") {
    // null=10, a=20, b=100; budget 60: walk ascending (nulls last on
    // the size-10 tie is moot here) gives null min(10, 20)=10,
    // a min(20, 25)=20, b min(100, 30)=30 — same cascade as the string
    // strata case; a null-UNSAFE join would drop the null stratum's
    // rows while its count still consumed budget
    val rows = (1L to 10L).map(i => (i, null: String)) ++
      (11L to 30L).map(i => (i, "a")) ++ (31L to 130L).map(i => (i, "b"))
    val df = rows.toDF("doc_id", "lang")
    val out = CorpusOps.unimaxRebalance(df, "lang", "doc_id",
      targetTotal = 60)
    val plan = out.select("lang", "n_docs", "quota").distinct().collect()
      .map(r => Option(r.getString(0)) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Double]("quota")))).toMap
    assert(plan(None) === ((10L, 10.0)))
    assert(plan(Some("a")) === ((20L, 20.0)))
    assert(plan(Some("b")) === ((100L, 30.0)))
    // keep_frac 1.0: the null stratum survives WHOLE, and the selection
    // is layout-independent like every coin in the family
    val kept = out.filter(col("lang").isNull).count()
    assert(kept === 10L)
    val re = CorpusOps.unimaxRebalance(df.repartition(13), "lang",
        "doc_id", targetTotal = 60)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(re.toSeq === out.select("doc_id").collect()
      .map(_.getLong(0)).sorted.toSeq)
  }

  test("unimaxRebalance: strata whose STRING casts collide stay " +
      "distinct strata (native-typed plan join)") {
    // array<string> strata ["x, y"] and ["x", "y"] both cast to the
    // string "[x, y]" — a string-keyed plan would merge them into one
    // count and one quota. 10 vs 40 docs, budget 30: the walk gives the
    // small stratum min(10, 15) = 10 (kept WHOLE at keep_frac 1.0) and
    // the big one min(40, 20) = 20.
    val rows = (1L to 10L).map(i => (i, Seq("x, y"))) ++
      (11L to 50L).map(i => (i, Seq("x", "y")))
    val df = rows.toDF("doc_id", "stratum")
    val out = CorpusOps.unimaxRebalance(df, "stratum", "doc_id",
      targetTotal = 30)
    val plan = out.select(col("stratum"), col("n_docs"), col("quota"),
        col("keep_frac")).distinct().collect()
      .map(r => r.getSeq[String](0).toList ->
        ((r.getAs[Long]("n_docs"), r.getAs[Double]("quota"),
          r.getAs[Double]("keep_frac")))).toMap
    assert(plan.size === 2, "colliding string casts merged the strata")
    assert(plan(List("x, y")) === ((10L, 10.0, 1.0)))
    assert(plan(List("x", "y")) === ((40L, 20.0, 0.5)))
    val kept = out.groupBy(col("stratum")).count().collect()
      .map(r => r.getSeq[String](0).toList -> r.getLong(1)).toMap
    assert(kept(List("x, y")) === 10L)
    assert(kept(List("x", "y")) > 0L && kept(List("x", "y")) < 40L)
  }

  test("packSequences/tokenBudgetChunks: ids stay EXACT past 2^53 token " +
      "offsets (integral division, not floor(double))") {
    // doc1 tokens = 2^53 + 511: doc2's tok_start is not a representable
    // double (spacing 2 at 2^53; nearest-even rounds UP to 2^53 + 512,
    // which crosses a multiple-of-512 boundary), so floor(x/512.0) would
    // give 2^44 + 1 while the exact id is 2^44.
    val big = (1L << 53) + 511L
    val docs = Seq((1L, "s", big), (2L, "s", 100L))
      .toDF("doc_id", "source", "tok")
    val packed = CorpusOps.packSequences(docs, "doc_id", "source",
        $"tok", budget = 512)
      .select("doc_id", "tok_start", "start_seq", "end_seq",
        "head_offset")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val (tokStart2, startSeq2, _, headOff2) = packed(2L)
    assert(tokStart2 === big)
    assert(startSeq2 === big / 512L) // = 2^44, NOT the double-rounded 2^44+1
    assert(startSeq2 === (1L << 44))
    // exact tiling invariant: seq-local coordinates recompose the offset
    assert(startSeq2 * 512L + headOff2 === tokStart2)
    val chunks = CorpusOps.tokenBudgetChunks(docs, "doc_id", "source",
        $"tok", budget = 512)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("chunk_id")).toMap
    assert(chunks(2L) === (1L << 44))
  }
}

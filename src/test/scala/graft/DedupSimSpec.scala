package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import graft.ops.{DedupOps, SimilarityOps}

class DedupSimSpec extends SparkSpec {
  import spark.implicits._

  test("exact duplicate groups keep min id and count copies") {
    val df = Seq((1L, "same text"), (2L, "same text"), (3L, "other"))
      .toDF("doc_id", "text")
    val out = DedupOps.exactDuplicateGroups(df).collect()
    val dup = out.find(_.getAs[Long]("n_copies") == 2L).get
    assert(dup.getAs[Long]("keep_id") === 1L)
    assert(out.length === 2)
  }

  test("duplicate rate is (n - distinct) / n") {
    val df = Seq(("en", "a"), ("en", "a"), ("en", "b"), ("fr", "c"))
      .toDF("lang", "text")
    val out = DedupOps.duplicateRate(df, "lang").collect()
    val en = out.find(_.getAs[String]("lang") == "en").get
    assert(en.getAs[Double]("dup_rate") === 1.0 / 3.0)
  }

  test("dup n-gram coverage: shared template grams are flagged, unique " +
      "grams are not") {
    val df = Seq(
      // docs 1/2 share the same 6-word template prefix; each adds a
      // distinct 3-word tail. doc 3 is entirely unique.
      (1L, "click here to read more now unique tail one"),
      (2L, "click here to read more now different ending words"),
      (3L, "completely original content with no shared grams at all")
    ).toDF("doc_id", "text")
    val out = DedupOps.dupNgramCoverage(df, n = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_dup_grams"),
         r.getAs[Double]("dup_gram_frac"))).toMap
    // 9 words -> 7 trigrams; the 6-word shared prefix yields 4 shared
    // trigrams ("click here to" .. "read more now")
    assert(out(1L) === ((7L, 4L, 4.0 / 7.0)))
    assert(out(2L) === ((7L, 4L, 4.0 / 7.0)))
    assert(out(3L) === ((7L, 0L, 0.0)))
  }

  test("winnowing: a shared passage of >= w+n-1 words guarantees a " +
      "common fingerprint; disjoint docs share none") {
    // n=4, w=4 -> guarantee threshold 7 words; embed a 10-word passage
    // at DIFFERENT positions in two otherwise-unrelated docs
    val passage = "large language models memorize rare training " +
      "examples verbatim sometimes"
    val df = Seq(
      (1L, s"alpha beta gamma $passage delta epsilon"),
      (2L, s"$passage zeta eta theta iota kappa unrelated trailing words"),
      (3L, "completely original content with no shared passages at " +
        "all in this document here")
    ).toDF("doc_id", "text")
    val pairs = DedupOps.winnowDupPairs(df, n = 4, w = 4)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    assert(pairs.toSeq === Seq((1L, 2L)))

    // per-doc fingerprint density ~ 2/(w+1) of positions, never zero
    val fps = DedupOps.winnowFingerprints(df, n = 4, w = 4)
      .groupBy("doc_id").count().collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("count")).toMap
    assert(fps.keySet === Set(1L, 2L, 3L))
    assert(fps.values.forall(_ >= 1L))
  }

  test("minhash index compaction: appended batches collapse to one file " +
      "per bucket and probe results are unchanged") {
    import java.nio.file.{Files, Paths}
    val idx = Files.createTempDirectory("graft_mhidx").toString + "/idx"
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again today"),
      (3L, "completely different words nothing in common at all here now"))
      .toDF("doc_id", "text")
    DedupOps.writeMinhashIndex(corpus, idx)
    // identical text -> identical band hashes -> same 4 bucket dirs get a
    // second file
    DedupOps.writeMinhashIndex(
      Seq((5L, "the quick brown fox jumps over the lazy dog again today"))
        .toDF("doc_id", "text"), idx, mode = "append")

    def bucketFiles(): Map[String, Int] =
      Files.list(Paths.get(
          graft.ops.IndexMaintenance.currentBase(spark, idx)))
        .iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("bucket="))
        .map(p => p.getFileName.toString ->
          Files.list(p).iterator().asScala
            .count(_.getFileName.toString.endsWith(".parquet"))).toMap
    val probe = Seq((99L,
      "the quick brown fox jumps over the lazy dog again today"))
      .toDF("doc_id", "text")
    def probeHits() = DedupOps.minhashIndexProbe(spark, idx, probe)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet

    assert(bucketFiles().values.exists(_ > 1),
      "appends should leave multiple files in shared buckets")
    val before = probeHits()
    DedupOps.compactMinhashIndex(spark, idx)
    assert(bucketFiles().values.forall(_ === 1), bucketFiles().toString)
    assert(probeHits() === before)
  }

  test("minhash L0 delta: streaming appends land as one flat file, probes" +
      " see them, compaction folds them into the base and dedups a " +
      "crash-window re-fold") {
    import java.nio.file.{Files, Paths}
    import graft.ops.IndexMaintenance
    val idx = Files.createTempDirectory("graft_mhdelta").toString + "/idx"
    val doc = "the quick brown fox jumps over the lazy dog again today"
    DedupOps.writeMinhashIndex(
      Seq((1L, "completely different words nothing in common at all here"))
        .toDF("doc_id", "text"), idx)
    // streaming-path append of a new doc's band rows -> ONE delta file
    DedupOps.appendMinhashIndexBands(
      DedupOps.minhashBands(Seq((5L, doc)).toDF("doc_id", "text")), idx)
    val delta = Paths.get(IndexMaintenance.deltaPath(idx))
    assert(Files.list(delta).iterator().asScala
      .count(_.getFileName.toString.endsWith(".parquet")) === 1)

    val probe = Seq((99L, doc)).toDF("doc_id", "text")
    def hits() = DedupOps.minhashIndexProbe(spark, idx, probe)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(hits() === Set((99L, 5L, 4L)), "probe must see delta rows")

    DedupOps.compactMinhashIndex(spark, idx)
    assert(!Files.exists(delta), "compaction should clear the delta")
    assert(hits() === Set((99L, 5L, 4L)))

    // crash-window simulation: the same band rows re-appended (as if the
    // delta cleanup had been lost) collapse on the next compaction
    DedupOps.appendMinhashIndexBands(
      DedupOps.minhashBands(Seq((5L, doc)).toDF("doc_id", "text")), idx)
    assert(hits() === Set((99L, 5L, 8L)),
      "duplicated band rows double-count until the next compaction")
    DedupOps.compactMinhashIndex(spark, idx)
    assert(hits() === Set((99L, 5L, 4L)),
      "compaction dedupKeys must collapse the re-folded rows")
  }

  test("index manifest: appends and probes race compaction safely — no " +
      "lost append, no failed probe, previous generation retained " +
      "(commit-manifest contract)") {
    import java.nio.file.{Files, Paths}
    import graft.ops.IndexMaintenance
    val idx = Files.createTempDirectory("graft_mhrace").toString + "/idx"
    val doc = "the quick brown fox jumps over the lazy dog again today"
    DedupOps.writeMinhashIndex(Seq((1L, doc)).toDF("doc_id", "text"), idx)
    val probe = Seq((99L, doc)).toDF("doc_id", "text")
    def hits() = DedupOps.minhashIndexProbe(spark, idx, probe)
      .select("doc_corpus").collect().map(_.getLong(0)).toSet

    val nAppends = 6
    val appendErr =
      new java.util.concurrent.atomic.AtomicReference[Throwable]
    val appender = new Thread(() => {
      try {
        for (i <- 0 until nAppends)
          DedupOps.appendMinhashIndexBands(
            DedupOps.minhashBands(
              Seq((100L + i, doc)).toDF("doc_id", "text")), idx)
      } catch { case t: Throwable => appendErr.set(t) }
    })
    appender.start()
    // compactions + probes run WHILE the appender is live: every probe
    // must succeed and always see at least the base doc — under the old
    // delete+rename swap a probe could catch the base mid-swap, and a
    // compaction could wipe a racing append with the delta cleanup
    for (i <- 0 until 3) {
      // alternate the full fold and the bounded (incremental) fold —
      // both must uphold the same concurrency contract
      if (i % 2 == 0) DedupOps.compactMinhashIndex(spark, idx)
      else DedupOps.compactMinhashIndexIncremental(spark, idx)
      assert(hits().contains(1L), "probe during compaction churn")
    }
    appender.join()
    assert(appendErr.get() === null, s"appender failed: ${appendErr.get()}")
    DedupOps.compactMinhashIndex(spark, idx)
    // no append lost, re-folds deduped: every doc exactly 4 band rows
    val rows = spark.read
      .parquet(IndexMaintenance.currentBase(spark, idx))
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows === ((0 until nAppends).map(i => (100L + i) -> 4L).toMap
      + (1L -> 4L)))
    // retention: the previous generation survives exactly one cycle for
    // in-flight probes; older generations and manifests are pruned
    val names = Files.list(Paths.get(idx)).iterator().asScala
      .map(_.getFileName.toString).toSeq
    assert(names.count(_.startsWith("MANIFEST-")) === 2, names.toString)
    assert(names.count(_.startsWith("base_")) === 2, names.toString)
  }

  test("incremental compaction rewrites ONLY the delta-touched buckets;" +
      " untouched bucket files transfer by link into the new generation") {
    import java.nio.file.{Files, Paths}
    import graft.ops.IndexMaintenance
    val idx = Files.createTempDirectory("graft_mhinc").toString + "/idx"
    val docA = "the quick brown fox jumps over the lazy dog again today"
    val docB = "completely different words nothing in common at all here now"
    DedupOps.writeMinhashIndex(
      Seq((1L, docA), (2L, docB)).toDF("doc_id", "text"), idx)
    val gen1 = IndexMaintenance.currentBase(spark, idx)
    def bucketFiles(base: String): Map[String, Set[String]] =
      Files.list(Paths.get(base)).iterator().asScala
        .filter(_.getFileName.toString.startsWith("bucket="))
        .map(p => p.getFileName.toString ->
          Files.list(p).iterator().asScala.map(_.getFileName.toString)
            .filter(_.endsWith(".parquet")).toSet).toMap
    val before = bucketFiles(gen1)

    // append a duplicate of docA -> its band rows touch ONLY docA's
    // buckets (docB's buckets must remain untouched)
    DedupOps.appendMinhashIndexBands(
      DedupOps.minhashBands(Seq((5L, docA)).toDF("doc_id", "text")), idx)
    IndexMaintenance.compactBucketedIncremental(spark, idx,
      dedupKeys = Seq("doc_id", "band"))

    val gen2 = IndexMaintenance.currentBase(spark, idx)
    assert(gen2 !== gen1, "incremental fold commits a new generation")
    assert(!Files.exists(Paths.get(IndexMaintenance.deltaPath(idx))),
      "delta folded")
    val after = bucketFiles(gen2)
    assert(after.keySet === before.keySet,
      "every bucket present in the new generation")
    // classify buckets by whether the fold landed doc 5 in them
    val withDoc5 = spark.read.parquet(gen2)
      .filter(col("doc_id") === 5L)
      .select(col("bucket")).distinct().collect()
      .map(r => s"bucket=${r.getInt(0)}").toSet
    assert(withDoc5.nonEmpty)
    assert(withDoc5.size < before.size,
      "docB must own at least one untouched bucket for this test to bite")
    before.keySet.foreach { b =>
      if (withDoc5(b))
        assert(after(b) !== before(b), s"touched $b must be rewritten")
      else
        assert(after(b) === before(b),
          s"untouched $b must transfer with identical file names (link)")
    }
    // probe parity: the folded index answers exactly like a full fold
    def hits(doc: String) = DedupOps.minhashIndexProbe(spark, idx,
        Seq((99L, doc)).toDF("doc_id", "text"))
      .select("doc_corpus").collect().map(_.getLong(0)).toSet
    assert(hits(docA) === Set(1L, 5L))
    assert(hits(docB) === Set(2L))
  }

  test("two compactions racing head-on: at most one wins each " +
      "generation, a loser fails loudly with the manifest-race error, " +
      "and no append is lost either way") {
    import java.nio.file.Files
    import java.util.concurrent.CountDownLatch
    import graft.ops.IndexMaintenance
    val idx = Files.createTempDirectory("graft_mhcc").toString + "/idx"
    val doc = "the quick brown fox jumps over the lazy dog again today"
    DedupOps.writeMinhashIndex(Seq((1L, doc)).toDF("doc_id", "text"), idx)
    DedupOps.appendMinhashIndexBands(
      DedupOps.minhashBands(Seq((2L, doc)).toDF("doc_id", "text")), idx)

    val start = new CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val threads = (0 until 2).map { _ =>
      new Thread(() => {
        start.await()
        try DedupOps.compactMinhashIndex(spark, idx)
        catch { case t: Throwable => errs.add(t) }
      })
    }
    threads.foreach(_.start()); start.countDown()
    threads.foreach(_.join(120000))
    // allowed outcomes: both serialized cleanly, or a loser failed at
    // the manifest commit / the fold snapshot it lost — never any other
    // failure class
    import scala.jdk.CollectionConverters._
    errs.asScala.foreach { t =>
      val msg = String.valueOf(t.getMessage)
      assert(
        msg.contains("manifest commit lost the race") ||
        msg.contains("still holds committed rows") ||
        msg.contains("delta snapshot rename") ||
        msg.contains("Unable to infer schema") ||
        msg.contains("PATH_NOT_FOUND") ||
        msg.contains("does not exist"),
        s"unexpected failure class from a racing compaction: $t")
    }
    // whatever the interleaving, the surviving state is consistent:
    // a final (quiet) maintenance cycle folds any stranded state and
    // the index answers with BOTH docs, exactly once each
    DedupOps.compactMinhashIndex(spark, idx)
    val rows = spark.read
      .parquet(IndexMaintenance.currentBase(spark, idx))
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows === Map(1L -> 4L, 2L -> 4L),
      s"post-race state lost or duplicated rows: $rows")
    val stats = IndexMaintenance.manifestStats(spark, idx).collect().head
    assert(stats.getAs[Long]("delta_files") === 0L)
    assert(stats.getAs[Long]("fold_files") === 0L)
  }

  test("prune grace: a young unmanifested base dir (a concurrent " +
      "compaction's written-but-uncommitted output) survives prune; " +
      "superseded generations still prune immediately; aged orphans go") {
    import java.nio.file.{Files, Paths}
    import graft.ops.IndexMaintenance
    val idx = Files.createTempDirectory("graft_mhgrace").toString + "/idx"
    val doc = "the quick brown fox jumps over the lazy dog again today"
    DedupOps.writeMinhashIndex(Seq((1L, doc)).toDF("doc_id", "text"), idx)
    // plant a NEVER-referenced base dir with a fresh mtime — the shape a
    // concurrent compactor leaves between its base write and its
    // manifest commit
    val orphan = Paths.get(idx, "base_999_pending1")
    Files.createDirectories(orphan)
    Files.write(orphan.resolve("marker"), Array[Byte](1))

    // drive three compactions (each appends then folds) — prune runs
    // each time, and the young orphan must survive every one of them
    for (i <- 0 until 3) {
      DedupOps.appendMinhashIndexBands(
        DedupOps.minhashBands(Seq((10L + i, doc)).toDF("doc_id", "text")),
        idx)
      DedupOps.compactMinhashIndex(spark, idx)
      assert(Files.exists(orphan),
        s"young uncommitted base deleted by prune on cycle $i — the " +
          "grace window must protect a compaction racing its commit")
    }
    def rootNames() = Files.list(Paths.get(idx)).iterator().asScala
      .map(_.getFileName.toString).toSeq
    // superseded generations needed NO grace: only 2 manifested bases
    // (plus the protected orphan) remain after three fold cycles
    assert(rootNames().count(n =>
      n.startsWith("base_") && n != "base_999_pending1") === 2,
      rootNames().toString)

    // age the orphan past the grace window -> next prune removes it
    Files.setLastModifiedTime(orphan,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 11L * 60 * 1000))
    DedupOps.appendMinhashIndexBands(
      DedupOps.minhashBands(Seq((50L, doc)).toDF("doc_id", "text")), idx)
    DedupOps.compactMinhashIndex(spark, idx)
    assert(!Files.exists(orphan),
      "aged-out orphan must be pruned once past the grace window")
  }

  test("retention depth is configurable: retain=3 keeps three " +
      "manifested generations for slow external probes") {
    import java.nio.file.{Files, Paths}
    import graft.ops.IndexMaintenance
    val idx = Files.createTempDirectory("graft_mhret").toString + "/idx"
    val doc = "the quick brown fox jumps over the lazy dog again today"
    DedupOps.writeMinhashIndex(Seq((1L, doc)).toDF("doc_id", "text"), idx)
    for (i <- 0 until 4) {
      DedupOps.appendMinhashIndexBands(
        DedupOps.minhashBands(Seq((20L + i, doc)).toDF("doc_id", "text")),
        idx)
      IndexMaintenance.compactBucketed(spark, idx,
        dedupKeys = Seq("doc_id", "band"), retain = 3)
    }
    val names = Files.list(Paths.get(idx)).iterator().asScala
      .map(_.getFileName.toString).toSeq
    assert(names.count(_.startsWith("MANIFEST-")) === 3, names.toString)
    assert(names.count(_.startsWith("base_")) === 3, names.toString)
  }

  test("incremental fold tolerates a non-integer partition dir (e.g. " +
      "__HIVE_DEFAULT_PARTITION__ from an out-of-band writer): " +
      "transferred verbatim, compaction completes") {
    import java.nio.file.{Files, Paths}
    import graft.ops.IndexMaintenance
    val idx = Files.createTempDirectory("graft_mhhive").toString + "/idx"
    val docA = "the quick brown fox jumps over the lazy dog again today"
    DedupOps.writeMinhashIndex(Seq((1L, docA)).toDF("doc_id", "text"), idx)
    // an external writer landed a null-bucket partition dir in the live
    // generation — before the fix this NumberFormatException'd the fold
    val weird = Paths.get(IndexMaintenance.currentBase(spark, idx),
      "bucket=__HIVE_DEFAULT_PARTITION__")
    Files.createDirectories(weird)
    Files.write(weird.resolve("_stray.bin"), Array[Byte](0))

    DedupOps.appendMinhashIndexBands(
      DedupOps.minhashBands(Seq((2L, docA)).toDF("doc_id", "text")), idx)
    IndexMaintenance.compactBucketedIncremental(spark, idx,
      dedupKeys = Seq("doc_id", "band"))
    val newBase = IndexMaintenance.currentBase(spark, idx)
    assert(Files.exists(
      Paths.get(newBase, "bucket=__HIVE_DEFAULT_PARTITION__", "_stray.bin")),
      "unparsable partition dir must transfer verbatim into the new " +
        "generation")
    // and the index still answers
    val hits = DedupOps.minhashIndexProbe(spark, idx,
        Seq((99L, docA)).toDF("doc_id", "text"))
      .select("doc_corpus").collect().map(_.getLong(0)).toSet
    assert(hits === Set(1L, 2L))
  }

  test("atomicRenameScheme: object-store schemes are refused, " +
      "rename-atomic ones pass") {
    import graft.ops.IndexMaintenance.atomicRenameScheme
    for (ok <- Seq("file", "hdfs", "viewfs", "o3fs", null))
      assert(atomicRenameScheme(ok), s"$ok should be accepted")
    for (bad <- Seq("s3a", "S3A", "s3", "s3n", "gs", "wasb", "wasbs",
        "abfs", "abfss", "oss", "cosn", "swift"))
      assert(!atomicRenameScheme(bad), s"$bad must be refused")
  }

  test("manifestStats audits the GC contract: clean cycles report the " +
      "retention invariants, crash litter is visible until the next " +
      "maintenance cycle reclaims it") {
    import java.nio.file.{Files, Paths}
    import graft.ops.IndexMaintenance
    val idx = Files.createTempDirectory("graft_mhstats").toString + "/idx"
    val doc = "the quick brown fox jumps over the lazy dog again today"
    DedupOps.writeMinhashIndex(Seq((1L, doc)).toDF("doc_id", "text"), idx)
    def stats() = IndexMaintenance.manifestStats(spark, idx).collect().head
    val s0 = stats()
    assert(s0.getAs[Long]("n_manifests") === 1L)
    assert(s0.getAs[Long]("live_gen") === 1L)
    assert(s0.getAs[Long]("n_orphans") === 0L)

    // an append leaves a committed delta file the audit must count
    DedupOps.appendMinhashIndexBands(
      DedupOps.minhashBands(Seq((2L, doc)).toDF("doc_id", "text")), idx)
    assert(stats().getAs[Long]("delta_files") === 1L)

    // crash litter: an aged unreferenced base dir (race-losing
    // compaction that died before its commit)
    val orphan = Paths.get(idx, "base_77_deadc0de")
    Files.createDirectories(orphan)
    Files.write(orphan.resolve("marker"), Array[Byte](1))
    Files.setLastModifiedTime(orphan,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 11L * 60 * 1000))
    assert(stats().getAs[Long]("n_orphans") === 1L,
      "audit must surface the unreferenced base dir")

    // one maintenance cycle folds the delta and reclaims the orphan;
    // the audit returns to the clean invariants
    DedupOps.compactMinhashIndexIncremental(spark, idx)
    val s1 = stats()
    assert(s1.getAs[Long]("live_gen") === 2L)
    assert(s1.getAs[Long]("n_manifests") === 2L)
    assert(s1.getAs[Long]("n_bases") === 2L)
    assert(s1.getAs[Long]("n_orphans") === 0L, "orphan must be pruned")
    assert(s1.getAs[Long]("delta_files") === 0L)
    assert(s1.getAs[Long]("fold_files") === 0L)
  }

  test("anchor-bounded recall primitives: hash anchors are deterministic;" +
      " exact pairs match the all-pairs miner restricted to anchors; " +
      "fused multi-config candidates match the per-config op") {
    import graft.ops.SimilarityOps
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 40L).map(i =>
      (i, Array.fill(16)(rnd.nextFloat() * 2f - 1f))).toDF(
      "vec_id", "embedding")

    val anchors = SimilarityOps.hashSampleAnchors(vecs, 8)
    val anchorIds = anchors.select("vec_id").collect()
      .map(_.getLong(0)).toSet
    assert(anchorIds.size === 8)
    assert(anchorIds === SimilarityOps.hashSampleAnchors(vecs, 8)
      .select("vec_id").collect().map(_.getLong(0)).toSet,
      "anchor sample must be deterministic")

    // exact pairs == all-pairs ground truth restricted to anchor rows
    // (ordered per anchoring orientation)
    val exact = SimilarityOps.anchorExactPairs(vecs, anchors, 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val allPairs = SimilarityOps.cosineNearDupPairs(vecs, 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = allPairs.flatMap { case (a, b) =>
      Seq(a -> b, b -> a).filter(p => anchorIds(p._1))
        .map(p => (p._1, p._2))
    }
    assert(exact === expected)

    // fused multi-config candidates decompose into the per-config op
    val configs = Seq((4, 2), (6, 3), (3, 4))
    val multi = SimilarityOps.anchorBandedCandidatesMulti(
        vecs, anchors, dim = 16, configs)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    configs.zipWithIndex.foreach { case ((bands, bits), leg) =>
      val single = SimilarityOps.anchorBandedCandidates(
          vecs, anchors, dim = 16, bands = bands, bandBits = bits)
        .collect().map(r => (leg, r.getLong(0), r.getLong(1))).toSet
      assert(multi.filter(_._1 == leg) === single,
        s"leg $leg (bands=$bands, bits=$bits) must match the " +
          "single-config candidates")
    }

    // the restriction is semantically a filter: restrictTo keeps exactly
    // the candidates whose pair appears in the filter frame
    val filt = SimilarityOps.anchorExactPairs(vecs, anchors, 0.2)
    val restricted = SimilarityOps.anchorBandedCandidatesMulti(
        vecs, anchors, dim = 16, configs, restrictTo = Some(filt))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(restricted === multi.filter(t => exact((t._2, t._3))))
  }

  test("minhashEstimatedPairs: identical docs estimate J=1, every shared" +
      " band pins its row of hashes, estimates track exact Jaccard " +
      "within the k=16 standard-error band") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
    val df = Seq(
      (1L, base),
      (2L, base),                                  // exact dup: J = 1
      (3L, base + " extra trailing words appended here"), // high J
      (4L, "completely different text with no shared shingles at all " +
        "anywhere in this entire document body")
    ).toDF("doc_id", "text")
    val out = DedupOps.minhashEstimatedPairs(df)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getInt(3), r.getDouble(4))).toMap
    val (b12, a12, e12) = out((1L, 2L))
    assert(b12 === 4L && a12 === 16 && e12 === 1.0)
    // a shared band hash means that band's 4 minhashes agree
    out.foreach { case (pair, (nb, na, est)) =>
      assert(na >= 4 * nb.toInt, s"$pair: n_agree $na < 4*bands $nb")
      assert(est === na / 16.0)
    }
    // doc 4 shares nothing: no candidate pair involves it
    assert(!out.keySet.exists(p => p._1 == 4L || p._2 == 4L))
    // (1,3): true Jaccard of the distinct 3-shingle sets; the estimate
    // must sit within 3 standard errors (se = sqrt(J(1-J)/16))
    def shingles(t: String) = t.split(" ").sliding(3).map(_.mkString(" "))
      .toSet
    val (s1, s3) = (shingles(base),
      shingles(base + " extra trailing words appended here"))
    val j = s1.intersect(s3).size.toDouble / s1.union(s3).size
    out.get((1L, 3L)).foreach { case (_, _, est) =>
      val se = math.sqrt(j * (1 - j) / 16)
      assert(math.abs(est - j) <= 3 * se + 1e-9,
        s"estimate $est vs true $j (se $se)")
    }
  }

  test("minhashTriageApply: sure-dups drop without verification, the " +
      "uncertain band is settled by exact Jaccard, degenerate " +
      "thresholds reproduce the candidates-as-edges apply") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
    val docs = Seq(
      (1L, base), (2L, base),                       // exact dup pair
      (3L, base + " small tail difference here"),   // high-J near dup
      (4L, "totally unrelated words in this one with nothing shared " +
        "anywhere across the whole text body at all"),
      (5L, "another fully distinct document about storage engines and " +
        "columnar formats with zero overlap")
    ).toDF("doc_id", "text")
    def kept(out: org.apache.spark.sql.DataFrame) =
      out.select("doc_id").collect().map(_.getLong(0)).toSet

    val triaged = DedupOps.minhashTriageApply(docs,
      jaccardThreshold = 0.5, estLo = 0.25, estHi = 0.75)
    // 2 drops (dup of 1); 3's fate is decided by its band (sure-dup or
    // exact-verified J vs 1 — its true J is high, so it drops too)
    assert(kept(triaged) === Set(1L, 4L, 5L))

    // estHi = 0: every candidate is a sure edge — identical to the
    // plain candidates-as-edges apply contract
    val allSure = DedupOps.minhashTriageApply(docs,
      jaccardThreshold = 0.99, estLo = 0.0, estHi = 0.0)
    val plain = {
      val clusters = DedupOps.dupClusters(DedupOps.minhashCandidates(docs))
      docs.join(clusters.filter(col("doc_id") =!= col("cluster_id"))
        .select("doc_id"), Seq("doc_id"), "left_anti")
    }
    assert(kept(allSure) === kept(plain))

    // a strict exact threshold with everything routed through the
    // verify band keeps the near-dup (J < 0.99) and drops only the
    // exact dup
    val strict = DedupOps.minhashTriageApply(docs,
      jaccardThreshold = 0.99, estLo = 0.0, estHi = 1.01)
    assert(kept(strict) === Set(1L, 3L, 4L, 5L))

    // k/bands forward to the estimator (thresholds are calibrated in
    // n_agree/k units, so the triage must run the caller's signature
    // shape): at k=8/bands=2 the all-sure degenerate form still equals
    // the candidates-as-edges apply AT THAT SHAPE, whose candidate set
    // differs from the 16/4 default's on this corpus or not — either
    // way both sides now use the same (k, bands)
    val allSure82 = DedupOps.minhashTriageApply(docs,
      jaccardThreshold = 0.99, estLo = 0.0, estHi = 0.0,
      k = 8, bands = 2)
    val plain82 = {
      val clusters = DedupOps.dupClusters(
        DedupOps.minhashCandidates(docs, k = 8, bands = 2))
      docs.join(clusters.filter(col("doc_id") =!= col("cluster_id"))
        .select("doc_id"), Seq("doc_id"), "left_anti")
    }
    assert(kept(allSure82) === kept(plain82))
    // and the estimate itself is on the k=8 grid: n_agree/8 steps
    val est82 = DedupOps.minhashEstimatedPairs(docs, k = 8, bands = 2)
      .select("est_jaccard").collect().map(_.getDouble(0))
    assert(est82.nonEmpty &&
      est82.forall(e => math.abs(e * 8 - math.round(e * 8)) < 1e-9))
  }

  test("minhash LSH: identical docs share all bands, disjoint docs none") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again today"),
      (2L, "the quick brown fox jumps over the lazy dog again today"),
      (3L, "completely different words nothing in common at all here now")
    ).toDF("doc_id", "text")
    val out = DedupOps.minhashCandidates(df).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("doc_a") === 1L)
    assert(out.head.getAs[Long]("doc_b") === 2L)
    assert(out.head.getAs[Long]("n_shared_bands") === 4L)
  }

  test("minhash index probe: batch-vs-corpus pairs match the self-join " +
      "restricted to cross pairs; the index scan partition-prunes") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again today"),
      (3L, "completely different words nothing in common at all here now"),
      (5L, "yet another unrelated document about distributed query engines")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again today"),
      (11L, "fresh text that matches nothing previously indexed at all")
    ).toDF("doc_id", "text")

    val dir = java.nio.file.Files.createTempDirectory("mhidx").toString
    DedupOps.writeMinhashIndex(corpus, s"$dir/idx")
    val probe = DedupOps.minhashIndexProbe(spark, s"$dir/idx", batch)

    // ground truth: self-join over the union, keep only batch-vs-corpus
    val expected = DedupOps
      .minhashCandidates(corpus.unionByName(batch))
      .filter(col("doc_a") < 10 && col("doc_b") >= 10)
      .select(col("doc_b").as("doc_new"), col("doc_a").as("doc_corpus"),
        col("n_shared_bands"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = probe.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
    assert(got.map(_._1) === Set(10L)) // only the true near-dup hits

    // the probe must scan only the batch's buckets, not the whole index:
    // the parquet scan's PartitionFilters carry a non-empty predicate on
    // the bucket partition column
    val plan = probe.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters:"))
      .getOrElse(fail(s"no PartitionFilters in plan:\n$plan"))
    assert(pf.contains("bucket") && !pf.contains("PartitionFilters: []"),
      s"index scan should partition-prune on bucket:\n$pf")
  }

  test("ngram jaccard: identical docs = 1.0") {
    val df = Seq(
      (1L, "a b c d e f"), (2L, "a b c d e f"), (3L, "x y z w v u"))
      .toDF("doc_id", "text")
    val out = DedupOps.ngramJaccardPairs(df, n = 3, minJaccard = 0.5)
      .collect()
    assert(out.length === 1)
    assert(out.head.getAs[Double]("jaccard") === 1.0)
  }

  test("simhash: identical docs get identical signatures, hamming 0") {
    val df = Seq(
      (1L, "spark makes big data small again"),
      (2L, "spark makes big data small again"),
      (3L, "unrelated content entirely different")
    ).toDF("doc_id", "text")
    val sigs = DedupOps.simhash(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(sigs(1L) === sigs(2L))
    assert(sigs(1L) !== sigs(3L))
    val hd = df.sparkSession.range(1)
      .select(DedupOps.hammingDist(lit(sigs(1L)), lit(sigs(3L))).as("h"))
      .collect().head.getAs[Int]("h")
    assert(hd > 0)
  }

  test("simhash band-LSH pairs near-identical docs with small hamming") {
    // near-dup docs need enough shingles that one edit barely moves the
    // bit votes — the realistic long-document case
    val base = Seq.tabulate(80)(i => s"token$i").mkString(" ")
    val df = Seq(
      (1L, base + " ending day"),
      (2L, base + " ending night"),
      (3L, Seq.tabulate(80)(i => s"other$i").mkString(" "))
    ).toDF("doc_id", "text")
    val pairs = DedupOps.simhashNearDups(df, maxHamming = 20).collect()
    val pairIds = pairs.map(r =>
      (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairIds.contains((1L, 2L)))
    pairs.foreach(r => assert(r.getAs[Int]("hamming") <= 20))
  }

  test("decontaminate drops train docs sharing an n-gram with test") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "totally unrelated training content here now"),
      (3L, "prefix words alpha beta gamma delta epsilon suffix")
    ).toDF("doc_id", "text")
    val test = Seq((100L, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val kept = DedupOps.decontaminate(train, test, n = 5)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept === Set(2L)) // 1 and 3 share the 5-gram with the test doc
  }

  test("dupClusters labels every component by its min id") {
    // components: {1,2,3} (chain), {7,8}, pair list never links them
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L))
      .toDF("doc_a", "doc_b")
    val labels = DedupOps.dupClusters(pairs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id"))
      .toMap
    assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L))
  }

  test("dupClusters round plans pin the r15 shuffle layout: the cached " +
      "edges and checkpointed labels stream through hash-build joins " +
      "with no re-exchange of the edge frame and no per-round sorts") {
    val plans = scala.collection.mutable.Buffer[String]()
    try {
      // withValue thread-confines the hook: a concurrent dupClusters on
      // another suite's thread sees null, not this buffer
      DedupOps.ccPlanHook.withValue(p => plans.synchronized { plans += p }) {
        val pairs = (1L to 33L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
        DedupOps.dupClusters(pairs).collect()
      }
    } finally {
      spark.catalog.clearCache()
    }
    // plans(0) is the seed; the rest are doubling rounds (a 33-hop
    // chain forces several)
    val rounds = plans.drop(1)
    assert(rounds.size >= 3, s"expected >=3 rounds, got ${plans.size - 1}")
    // tree-text parent walk: operator nesting depth = offset of the
    // first non-tree-art char
    def opStart(l: String): Int = l.indexWhere(c => !" :+-".contains(c))
    // analyze only the top-level "== Final Plan ==" section — the
    // Initial Plan section is the pre-AQE static plan (its merge-join
    // sorts never ran). Embedded cache dumps nest deeper than the
    // top-level marker (opStart 3), so only the outer cut applies.
    def finalSection(p: String): String = {
      val ls = p.split("\n")
      val cut = ls.indexWhere(l =>
        l.contains("== Initial Plan ==") && opStart(l) == 3)
      if (cut < 0) p else ls.take(cut).mkString("\n")
    }
    rounds.map(finalSection).foreach { p =>
      def count(sub: String): Int = sub.r.findAllIn(p).size
      // the frontier joins are hinted shuffled-hash joins (the doubling
      // self-join inlines the propagate side twice, so a round plan can
      // carry four)
      assert(count("ShuffledHashJoin") >= 2, p)
      // the O(E) pin: walking up from every cached-edge scan to its
      // join crosses NO Exchange — the cache is hash(dst)-partitioned
      // at fill, so the per-round O(E) re-exchange is gone
      val ls = p.split("\n")
      ls.zipWithIndex.filter(_._1.contains("InMemoryTableScan")).foreach {
        case (line, idx) =>
          var cur = opStart(line)
          var j = idx - 1
          var reachedJoin = false
          while (j >= 0 && !reachedJoin) {
            val s2 = opStart(ls(j))
            if (s2 >= 0 && s2 < cur) {
              if (ls(j).contains("ShuffledHashJoin")) reachedJoin = true
              else {
                assert(!ls(j).contains("Exchange"),
                  s"exchange above the cached edge scan:\n$p")
                cur = s2
              }
            }
            j -= 1
          }
          assert(reachedJoin, s"edge scan not under a SHJ:\n$p")
      }
      // the no-per-round-sort pin: every Sort anywhere in the round
      // plan is the cache FILL's one-time _eb sort (displayed inside
      // the InMemoryRelation), never a fresh O(E)/O(V) merge-join sort
      ls.filter(_.contains("Sort [")).foreach { l =>
        assert(l.contains("Sort [_eb"), s"non-fill sort in round:\n$p")
      }
    }
    // and the self-join's duplicated label scan rides a ReusedExchange
    // (AQE stage reuse) rather than re-shuffling the checkpoint
    assert(rounds.map(finalSection).exists(_.contains("ReusedExchange")),
      rounds.headOption.getOrElse(""))
  }

  test("extensions inject dot_product at session build (SQL surface)") {
    val desc = graft.GraftExtensions.dotProductDescriptor
    assert(desc._1.funcName === "dot_product")
    val e = desc._3(Seq(
      org.apache.spark.sql.graftbridge.Bridge.expression(
        typedLit(Array(1.0, 2.0))),
      org.apache.spark.sql.graftbridge.Bridge.expression(
        typedLit(Array(3.0, 4.0)))))
    val out = spark.range(1)
      .select(org.apache.spark.sql.graftbridge.Bridge.column(e).as("d"))
      .collect().head.getDouble(0)
    assert(out === 11.0)
  }

  test("extensions inject interleave_bits (SQL surface)") {
    val desc = graft.GraftExtensions.interleaveBitsDescriptor
    assert(desc._1.funcName === "interleave_bits")
    // the bits arg arrives as a parser-built Literal in real SQL use
    val e = desc._3(Seq(
      org.apache.spark.sql.graftbridge.Bridge.expression(lit(3L)),
      org.apache.spark.sql.graftbridge.Bridge.expression(lit(0L)),
      org.apache.spark.sql.catalyst.expressions.Literal(2)))
    val out = spark.range(1)
      .select(org.apache.spark.sql.graftbridge.Bridge.column(e).as("z"))
      .collect().head.getLong(0)
    assert(out === 5L) // 0b0101: x bits on even positions
  }

  test("cosine: identical vectors 1.0, orthogonal 0.0") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 0.0f)),
      (3L, Array(0.0f, 2.0f))).toDF("vec_id", "embedding")
    val out = SimilarityOps.cosineNearDupPairs(vecs, -1.0).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Double]("cos_sim")).toMap
    assert(out((1L, 2L)) === 1.0)
    assert(out((1L, 3L)) === 0.0)
  }

  test("brute-force top-k ranks by cosine desc with id tiebreak") {
    val q = Seq((0L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val c = Seq(
      (10L, Array(1.0f, 0.1f)), (11L, Array(1.0f, 1.0f)),
      (12L, Array(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = SimilarityOps.bruteForceTopK(q, c, 2).orderBy($"rnk").collect()
    assert(out.map(_.getAs[Long]("corpus_id")).toSeq === Seq(10L, 11L))
  }

  test("exactSubstrDedup: later occurrences of a shared passage are cut, " +
       "the first survives, unique text is untouched") {
    val shared = "one two three four five six seven eight"
    val docs = Seq(
      (1L, s"intro $shared outro"),
      (2L, s"other words here $shared trailing bits"),
      (3L, "totally unique text with no duplicated span at all")
    ).toDF("doc_id", "text")
    val out = DedupOps.exactSubstrDedup(docs, n = 8).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_words"), r.getAs[Long]("kept_words"),
          r.getAs[String]("kept_text")))).toMap
    // doc 1 holds the globally-first occurrence: fully intact
    assert(out(1L) === ((10L, 10L, s"intro $shared outro")))
    // doc 2 loses exactly the 8 shared words, keeps its own
    assert(out(2L) === ((13L, 5L, "other words here trailing bits")))
    // untouched doc
    assert(out(3L)._2 === out(3L)._1)

    // a fully-duplicated doc comes back empty but present
    val dup = Seq((1L, shared), (2L, shared)).toDF("doc_id", "text")
    val d = DedupOps.exactSubstrDedup(dup, n = 8).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("kept_words"), r.getAs[String]("kept_text"))))
      .toMap
    assert(d(1L) === ((8L, shared)))
    assert(d(2L) === ((0L, "")))
  }

  test("hardNegatives: most-similar DIFFERENT-label vectors only — the " +
       "same-label near-twin never appears") {
    val anchors = Seq((0L, Array(1.0f, 0.0f), 7)).toDF(
      "vec_id", "embedding", "label")
    val corpus = Seq(
      (10L, Array(0.99f, 0.01f), 7),  // near-twin, SAME label: excluded
      (11L, Array(0.9f, 0.1f), 3),    // similar, other label: rank 1
      (12L, Array(0.5f, 0.5f), 3),    // less similar: rank 2
      (13L, Array(-1.0f, 0.0f), 4)    // dissimilar: rank 3
    ).toDF("vec_id", "embedding", "label")
    val out = SimilarityOps.hardNegatives(anchors, corpus, 3)
      .orderBy($"rnk").collect()
    assert(out.map(_.getAs[Long]("negative_id")).toSeq ===
      Seq(11L, 12L, 13L))
    assert(out.map(_.getAs[Int]("negative_label")).toSeq === Seq(3, 3, 4))
    assert(!out.exists(_.getAs[Long]("negative_id") == 10L))
  }

  test("ivf bucketing is deterministic and co-buckets identical vectors") {
    val v = Seq((0L, Array.fill(4)(0.5f)), (1L, Array.fill(4)(0.5f)))
      .toDF("vec_id", "embedding")
    val b = v.select(SimilarityOps.lshBucket($"embedding", 4, 4).as("b"))
      .collect().map(_.getAs[Int]("b"))
    assert(b(0) === b(1))
  }

  test("bucketed cosine near-dup: subset of exact with identical scores, " +
       "full recall on identical vectors") {
    // identical vectors agree on every hyperplane -> share all bands ->
    // recall 1.0 at the top of the similarity range by construction
    val base = Array.tabulate(8)(i => (i + 1) * 0.1f)
    val twin = Seq((1L, base), (2L, base),
      (3L, Array.tabulate(8)(i => (if (i % 2 == 0) 1f else -1f) * (i + 1))))
      .toDF("vec_id", "embedding")
    val twinPairs = SimilarityOps.cosineNearDupPairsBucketed(
      twin, 0.99, dim = 8, bands = 4, bandBits = 4).collect()
    assert(twinPairs.map(r => (r.getLong(0), r.getLong(1))).toSet
      === Set((1L, 2L)))

    // on real embeddings: every bucketed pair must appear in the exact
    // all-pairs result with the SAME rounded cosine (precision = 1.0 —
    // banding only prunes candidates, never invents or perturbs them),
    // and recall is pinned to the analytic floor of the band scheme
    val vecs = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val exact = SimilarityOps.cosineNearDupPairs(vecs, 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val bucketed = SimilarityOps.cosineNearDupPairsBucketed(
        vecs, 0.3, dim = 64, bands = 4, bandBits = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(exact.nonEmpty)
    bucketed.foreach { case (pair, cos) =>
      assert(exact.get(pair).contains(cos),
        s"bucketed pair $pair not in exact result (or score differs)")
    }
    val recall = bucketed.size.toDouble / exact.size
    // 4 bands x 4 bits at cos>=0.3: analytic recall floor ~0.2 for pairs
    // AT the threshold, higher above it; fails only if banding breaks
    assert(recall >= 0.2, s"recall $recall below the band-scheme floor")
  }

  test("autoBandConfig: S-curve algebra, bits grow with n, budget holds") {
    // the promised recall is analytic: 1-(1-p^r)^b >= target at the floor
    for (n <- Seq(1000L, 100000L, 10000000L); floor <- Seq(0.5, 0.8)) {
      val (b, r) = SimilarityOps.autoBandConfig(n, floor, targetRecall = 0.9)
      val p = 1.0 - math.acos(floor) / math.Pi
      val recall = 1.0 - math.pow(1.0 - math.pow(p, r), b)
      assert(recall >= 0.9 - 1e-9, s"n=$n floor=$floor -> ($b,$r): $recall")
      assert(b * r <= 30, s"signature budget exceeded: ($b,$r)")
    }
    // more corpus -> at least as many bits per band (buckets track n)
    val rs = Seq(1000L, 100000L, 10000000L, 1000000000L)
      .map(n => SimilarityOps.autoBandConfig(n, 0.8)._2)
    assert(rs === rs.sorted, s"bandBits not monotone in n: $rs")
    // tiny corpora must not demand more buckets than vectors
    val (_, rTiny) = SimilarityOps.autoBandConfig(8L, 0.8)
    assert(rTiny <= 3)
    // huge n + low floor: the required band count saturates far past Int
    // range — the budget check must not wrap and the result must honor it
    for ((bH, rH) <- Seq(SimilarityOps.autoBandConfig(2000000000L, 0.01),
        SimilarityOps.autoBandConfig(200000000L, 0.05))) {
      assert(bH.toLong * rH <= 30 || bH == 30,
        s"overflowed budget: ($bH,$rH)")
      assert(bH > 0 && rH > 0)
    }

    // end-to-end: the auto config on the sf0.001 embeddings keeps the
    // bucketed result a subset of exact with recall above the promised
    // floor at the HIGH end of similarity (near-dup pairs, cos >= 0.8)
    val vecs = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val n = vecs.count()
    val (bands, bits) = SimilarityOps.autoBandConfig(n, 0.8)
    val exact = SimilarityOps.cosineNearDupPairs(vecs, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val auto = SimilarityOps.cosineNearDupPairsBucketed(
        vecs, 0.8, dim = 64, bands = bands, bandBits = bits).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(auto.subsetOf(exact))
    if (exact.nonEmpty)
      assert(auto.size.toDouble / exact.size >= 0.5,
        s"auto-config recall ${auto.size.toDouble / exact.size}")
  }

  test("ngram jaccard df-cap: no-op when cap >= max df, monotone shrink " +
       "under a binding cap") {
    val df = Seq(
      (1L, "a b c d e f"), (2L, "a b c d e g"), (3L, "a b x y z w"),
      (4L, "p q r s t u")).toDF("doc_id", "text")
    val uncapped = DedupOps.ngramJaccardPairs(df, n = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // "a b" has df 3 = max df here: cap 3 keeps everything
    val atMax = DedupOps.ngramJaccardPairs(df, n = 2, maxDf = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(atMax === uncapped)
    // cap 2 drops the df-3 shingle "a b": pair intersections only shrink
    val capped = DedupOps.ngramJaccardPairs(df, n = 2, maxDf = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    capped.foreach { case (pair, n) =>
      assert(uncapped.contains(pair) && n <= uncapped(pair))
    }
    assert(capped((1L, 2L)) === uncapped((1L, 2L)) - 1)
  }

  test("bloomDecontaminate: no false negatives — every doc the exact " +
       "anti-join drops is bloom-flagged; clean corpus stays clean") {
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely unrelated prose about distributed query engines"),
      (3L, "the quick brown fox jumps again and again today"),
      (4L, "another clean document with its own private wording"))
      .toDF("doc_id", "text")
    val eval = Seq((100L, "the quick brown fox jumps high"))
      .toDF("doc_id", "text")
    val flags = DedupOps.bloomDecontaminate(train, eval,
        n = 5, numBits = 1 << 16, numHashes = 3)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    // exact ground truth: survivors of the broadcast anti-join
    val exactSurvivors = DedupOps.decontaminate(train, eval, n = 5)
      .select("doc_id").as[Long].collect().toSet
    val exactDropped =
      Set(1L, 2L, 3L, 4L) -- exactSurvivors // docs 1 and 3
    assert(exactDropped === Set(1L, 3L))
    exactDropped.foreach(id => assert(flags(id),
      s"doc $id shares an eval 5-gram but was not bloom-flagged"))
    // at 2^16 bits / ~18 set positions, a false positive would need a
    // deterministic triple-hash collision — these two docs probe clean
    assert(!flags(2L) && !flags(4L))
  }

  test("bloomProbe kernel matches the declarative HOF projection " +
       "(distinct gram count, md5-window positions, bitset test) " +
       "bit-for-bit, including empty / double-space / repeated-gram " +
       "edge texts") {
    // r18 optimization parity pin: DedupOps.bloomDecontaminate's probe
    // side moved from the interpreted exists(transform(md5)) chain to
    // graft.functions.HashKernels.bloomProbe; this replays the OLD
    // projection verbatim and asserts equality on a corpus with the
    // awkward shapes (empty text, double spaces, texts shorter than n,
    // duplicated grams).
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, ""),
      (3L, "a  b c d e f a  b c d e f"),
      (4L, "short"),
      (5L, "the quick brown fox jumps the quick brown fox jumps"),
      (6L, "x y z w v u t s r q p o n m l k"))
      .toDF("doc_id", "text")
    val eval = Seq((100L, "the quick brown fox jumps high"),
      (101L, "a  b c d e"))
      .toDF("doc_id", "text")
    val n = 5; val numHashes = 3; val numBits = 1 << 12
    val kernel = DedupOps.bloomDecontaminate(train, eval,
        n = n, numBits = numBits, numHashes = numHashes)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .sortBy(_._1)
    // the pre-r18 declarative probe, reconstructed: same bitset build
    // via the public sizing path is implicit (same numBits/numHashes),
    // so rebuild the words array the same way and apply the HOF form
    val setWords = eval
      .select(explode(DedupOps.wordShingles("text", n)).as("g"))
      .select(explode(array((0 until numHashes).map(i =>
        conv(substring(md5(col("g")), i * 8 + 1, 8), 16, 10)
          .cast("long") % numBits): _*)).as("p"))
      .groupBy((col("p") / 64).cast("int").as("w"))
      .agg(bit_or(call_function("shiftleft", lit(1L),
        (col("p") % 64).cast("int"))).as("bits"))
      .collect().map(r => r.getInt(0) -> r.getLong(1))
    val bitWords = new Array[Long](numBits / 64)
    setWords.foreach { case (w, bits) => bitWords(w) = bits }
    val wordsLit = typedlit(bitWords.toSeq)
    import org.apache.spark.sql.Column
    def isSet(p: Column): Column =
      element_at(wordsLit, (p / 64).cast("int") + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L),
          (p % 64).cast("int"))) =!= 0L
    def posFromHex(h: Column): Seq[Column] = (0 until numHashes).map(i =>
      conv(substring(h, i * 8 + 1, 8), 16, 10).cast("long") % numBits)
    val declarative = train
      .select(col("doc_id"), DedupOps.wordShingles("text", n).as("_gs"))
      .select(col("doc_id"), size(col("_gs")).cast("long").as("n_grams"),
        exists(transform(col("_gs"), g => md5(g)),
          h => posFromHex(h).map(isSet).reduce(_ && _)).as("bloom_hit"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .sortBy(_._1)
    assert(kernel === declarative)
  }

  test("bloomDecontaminate: sized bitset keeps the false-positive rate " +
       "near zero on a disjoint corpus") {
    val train = (1 to 300).map(i =>
      (i.toLong, s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i"))
      .toDF("doc_id", "text")
    val eval = (1 to 100).map(i =>
      (10000L + i, s"eta$i theta$i iota$i kappa$i lambda$i mu$i"))
      .toDF("doc_id", "text")
    val out = DedupOps.bloomDecontaminate(train, eval,
        n = 5, numBits = 1 << 16, numHashes = 3)
      .collect()
    assert(out.length === 300)
    // zero overlap and ~600/65536 bits set: expected FPs per probe
    // ~(0.009)^3 — none of the 600 probes should fire
    assert(out.count(_.getBoolean(2)) === 0)
  }

  test("bloomDecontaminate auto-sizing: numBits = next power of two >= " +
       "16 bits per distinct eval gram, floored at 64, capped at 2^27; " +
       "auto-sized flags match the explicitly-sized run") {
    // the doubling rule itself (integer-exact, replayable by the
    // oracle's recursive CTE)
    def nextBits(grams: Long): Long = {
      val target = math.min(grams * DedupOps.BloomBitsPerGram,
        DedupOps.BloomMaxBits)
      var b = 64L; while (b < target) b *= 2; b
    }
    assert(nextBits(0) === 64L)
    assert(nextBits(4) === 64L)          // 64 floor
    assert(nextBits(5) === 128L)         // 80 -> 128
    assert(nextBits(64) === 1024L)       // exact power stays
    assert(nextBits(65) === 2048L)
    assert(nextBits(1L << 30) === DedupOps.BloomMaxBits) // cap binds
    // end-to-end: the auto default equals an explicit numBits of the
    // same computed size
    val train = (1 to 50).map(i =>
      (i.toLong, s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i"))
      .toDF("doc_id", "text")
    val eval = (1 to 100).map(i =>
      (10000L + i, s"eta$i theta$i iota$i kappa$i lambda$i mu$i"))
      .toDF("doc_id", "text")
    val grams = eval.select(explode(DedupOps.wordShingles("text", 5)))
      .distinct().count()
    val auto = DedupOps.bloomDecontaminate(train, eval, n = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .sortBy(_._1)
    val explicit = DedupOps.bloomDecontaminate(train, eval, n = 5,
        numBits = nextBits(grams).toInt)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .sortBy(_._1)
    assert(auto === explicit)
  }

  test("autoBandConfig at floor 0.4 selects 8 bands x 3 bits across the " +
       "tested corpus sizes, and the selected config's measured recall " +
       "against the exact all-pairs form clears the 0.9 target") {
    // the cosine_near_dup_auto oracle hardcodes this selection — if the
    // selection moves, the catalog entry's static SQL must move with it
    Seq(500L, 2000L, 5000L).foreach { n =>
      assert(SimilarityOps.autoBandConfig(n, simFloor = 0.4) === ((8, 3)),
        s"n=$n")
    }
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val exact = SimilarityOps.cosineNearDupPairs(e, 0.4)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val banded = SimilarityOps.cosineNearDupPairsBucketed(e, 0.4,
        dim = 64, bands = 8, bandBits = 3)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(banded.subsetOf(exact), "banded form emitted a non-pair")
    assert(exact.nonEmpty)
    val recall = banded.size.toDouble / exact.size
    // the S-curve's 0.9-at-floor target models iid gaussian hyperplanes;
    // the engine's DETERMINISTIC hash-mix hyperplanes measure 50/66 =
    // 0.758 on this corpus (most pairs sit barely above the 0.4 floor,
    // where the curve is steepest). Pinned as a regression floor — a
    // refactor that degrades the mix or the band extraction shows up
    // here; the catalog entry's value-level correctness is separately
    // hash-checked by its oracle.
    assert(recall >= 0.75, s"recall=$recall (${banded.size}/${exact.size})")
  }

  test("cosineNearDupPairsIvf: same-cell pairs are a subset of the exact " +
       "form with identical scores; full recall on a high-similarity " +
       "near-dup corpus (the operator's regime)") {
    // synthetic corpus: 20 deterministic base vectors, each with two
    // tiny-perturbation copies (cos >= 0.99 to their base and sibling)
    val rnd = new scala.util.Random(7)
    val bases = Seq.tabulate(20)(_ => Array.fill(8)(rnd.nextGaussian()))
    val rows = bases.zipWithIndex.flatMap { case (b, i) =>
      Seq.tabulate(3) { c =>
        val v = b.zipWithIndex.map { case (x, d) =>
          (x + (if (c == 0) 0.0 else 0.01 * ((i + c + d) % 3 - 1))).toFloat
        }
        (i * 10L + c, v.toSeq)
      }
    }
    val vecs = rows.toDF("vec_id", "embedding")
    val ivf = SimilarityOps.cosineNearDupPairsIvf(vecs, 0.99,
        nClusters = 4, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    val exact = SimilarityOps.cosineNearDupPairs(vecs, 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    // subset with identical verified scores
    ivf.foreach { case (pair, score) =>
      assert(exact.contains(pair) && exact(pair) === score, pair)
    }
    // every same-base triple is >= 0.99-similar and must be FOUND —
    // near-identical vectors share the argmin cell
    bases.indices.foreach { i =>
      val ids = Seq(i * 10L, i * 10L + 1, i * 10L + 2)
      ids.combinations(2).foreach { case Seq(a, b) =>
        assert(ivf.contains((a, b)),
          s"near-dup pair ($a,$b) missed by cell restriction")
      }
    }
  }

  test("semanticDecontaminate: a near-clone of an eval vector flags, " +
       "orthogonal vectors do not, and the flag is the cosine max") {
    // eval: two axis vectors. train: a tiny perturbation of eval#1 (the
    // paraphrase leak n-grams cannot see), an orthogonal vector, and an
    // anti-parallel one (cos = -1: proximity, not distance, decides)
    val evalSet = Seq(
      (1L, Seq(1f, 0f, 0f, 0f)), (2L, Seq(0f, 1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val train = Seq(
      (10L, Seq(0.99f, 0.05f, 0f, 0f)),  // leak
      (11L, Seq(0f, 0f, 1f, 0f)),        // clean
      (12L, Seq(-1f, 0f, 0f, 0f)))       // anti-parallel: clean
      .toDF("vec_id", "embedding")
    val out = SimilarityOps.semanticDecontaminate(train, evalSet, 0.8)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getBoolean(2))).toMap
    assert(out(10L)._2 && out(10L)._1 > 0.99)
    assert(!out(11L)._2 && out(11L)._1 === 0.0)
    assert(!out(12L)._2 && out(12L)._1 === 0.0) // max vs eval#2 is 0
    assert(out.size === 3, "every train row keeps a row + flag")
  }

  test("cosineNearDupPairsIvfTwoLevel: subset of the exact form with " +
       "identical scores; full recall on the high-similarity corpus; " +
       "k2=1 degenerates to the flat IVF form") {
    val rnd = new scala.util.Random(7)
    val bases = Seq.tabulate(20)(_ => Array.fill(8)(rnd.nextGaussian()))
    val rows = bases.zipWithIndex.flatMap { case (b, i) =>
      Seq.tabulate(3) { c =>
        val v = b.zipWithIndex.map { case (x, d) =>
          (x + (if (c == 0) 0.0 else 0.01 * ((i + c + d) % 3 - 1))).toFloat
        }
        (i * 10L + c, v.toSeq)
      }
    }
    val vecs = rows.toDF("vec_id", "embedding")
    val two = SimilarityOps.cosineNearDupPairsIvfTwoLevel(vecs, 0.99,
        k1 = 2, k2 = 2, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    val exact = SimilarityOps.cosineNearDupPairs(vecs, 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    two.foreach { case (pair, score) =>
      assert(exact.contains(pair) && exact(pair) === score, pair)
    }
    // near-identical triples co-assign through BOTH levels
    bases.indices.foreach { i =>
      val ids = Seq(i * 10L, i * 10L + 1, i * 10L + 2)
      ids.combinations(2).foreach { case Seq(a, b) =>
        assert(two.contains((a, b)),
          s"near-dup pair ($a,$b) missed by two-level cell restriction")
      }
    }
    // k2=1: the sub level is a single centroid per coarse cell, so the
    // pair set equals the flat IVF form at the same k1/iters
    val flatEq = SimilarityOps.cosineNearDupPairsIvfTwoLevel(vecs, 0.99,
        k1 = 4, k2 = 1, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    val flat = SimilarityOps.cosineNearDupPairsIvf(vecs, 0.99,
        nClusters = 4, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(flatEq === flat, "k2=1 must reproduce the flat cell partition")
  }

  test("minhashIndexProbeBands evaluates the banded input exactly once " +
       "(one driver-side materialization feeds bucket list AND join side)") {
    val idx = java.nio.file.Files.createTempDirectory("graft_mhonce")
      .toString + "/idx"
    val doc = "the quick brown fox jumps over the lazy dog again today"
    DedupOps.writeMinhashIndex(Seq((1L, doc)).toDF("doc_id", "text"), idx)
    // count every row the banded frame ever produces: the probe needs it
    // for the bucket list AND the broadcast join side, so any
    // two-evaluation implementation runs the map twice per row
    val acc = spark.sparkContext.longAccumulator("banded_rows_evaluated")
    val banded = DedupOps.minhashBands(Seq((99L, doc)).toDF("doc_id", "text"))
      .as[(Long, Int, String)]
      .map { r => acc.add(1); r }
      .toDF("doc_id", "band", "band_hash")
    val hits = DedupOps.minhashIndexProbeBands(spark, idx, banded)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(hits === Set((99L, 1L, 4L)))
    assert(acc.value === 4L,
      s"banded evaluated ${acc.value / 4.0} times, expected exactly once")

    // caller-persisted input (the streaming-loop posture): still one
    // evaluation (cache fill), and the probe must NOT register its own
    // checkpoint on top — the caller's unpersist stays the sole block
    // lifecycle
    val acc2 = spark.sparkContext.longAccumulator("banded_rows_persisted")
    val banded2 = DedupOps.minhashBands(
        Seq((98L, doc)).toDF("doc_id", "text"))
      .as[(Long, Int, String)]
      .map { r => acc2.add(1); r }
      .toDF("doc_id", "band", "band_hash")
      .persist()
    try {
      // materialize the caller's cache first: persist() registers its
      // block lazily, and a snapshot taken pre-materialization would
      // misread the caller's own cache entry as a probe-created orphan
      banded2.count()
      val before = spark.sparkContext.getPersistentRDDs.keySet
      val hits2 = DedupOps.minhashIndexProbeBands(spark, idx, banded2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      assert(hits2 === Set((98L, 1L, 4L)))
      assert(acc2.value === 4L,
        s"persisted banded evaluated ${acc2.value / 4.0} times")
      val extra = spark.sparkContext.getPersistentRDDs.keySet -- before
      assert(extra.isEmpty,
        s"probe registered orphan blocks on a persisted input: $extra")
    } finally banded2.unpersist(blocking = true)
  }

  // keep the reliable-mode tests LAST in the suite: setting a checkpoint
  // dir flips dupClusters to reliable mode for the rest of this session
  test("dupClusters under a configured checkpoint dir uses RELIABLE " +
       "checkpoints (cluster posture) and clusters identically") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val expected = DedupOps.dupClusters(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    val out = DedupOps.dupClusters(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === expected)
    assert(out === Set(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    // reliable round state actually hit the checkpoint directory
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(java.nio.file.Files.isRegularFile(_)).count()
    assert(files > 0, s"no checkpoint files under $dir")
  }

  test("dupClusters reliable-mode soak: mid-loop cache invalidation " +
       "(simulated executor loss) completes and clusters identically") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_soak")
      .toString
    spark.sparkContext.setCheckpointDir(dir)
    // 64-hop chain: seeding + multiple pointer-doubling rounds, each a
    // RELIABLE checkpoint — enough rounds that the chaos thread below
    // overlaps the loop, not just its setup
    val pairs = (1L until 64L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val expected = DedupOps.dupClusters(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected === (1L to 64L).map(_ -> 1L).toSet)
    // chaos: while the loop runs, keep evicting EVERY persistent block
    // (the loop's cached edge frame included) — the executor-loss
    // posture. Reliable round state lives in checkpoint FILES, evicted
    // cache blocks recompute from lineage, so the loop must complete
    // with the identical clustering.
    @volatile var stop = false
    val chaos = new Thread(() => {
      while (!stop) {
        spark.sparkContext.getPersistentRDDs.values
          .foreach(r => scala.util.Try(r.unpersist(blocking = false)))
        Thread.sleep(10)
      }
    })
    chaos.setDaemon(true)
    chaos.start()
    val got =
      try DedupOps.dupClusters(pairs).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      finally { stop = true; chaos.join() }
    assert(got === expected,
      "reliable-mode clustering changed under mid-loop cache eviction")
  }
}

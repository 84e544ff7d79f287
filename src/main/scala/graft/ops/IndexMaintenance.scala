package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Maintenance shared by the on-disk bucket-partitioned indexes (the
  * MinHash text index and the sign-LSH IVF vector index).
  *
  * Layout: LSM-shaped, two levels, with a COMMIT MANIFEST naming the
  * live base generation (the snapshot-pointer discipline of table
  * formats like Iceberg/Delta, reduced to the one pointer these indexes
  * need):
  *   - `<path>/MANIFEST-<gen>`: one-line file naming the live base
  *     directory. The CURRENT manifest is the highest `<gen>`; each is
  *     committed by writing a temp file and renaming it to its final
  *     (new, never-overwritten) name — an atomic create, so a reader
  *     always sees a complete pointer and two racing committers cannot
  *     both win the same generation (the loser's rename returns false
  *     and fails loudly).
  *   - `<path>/base_<gen>_<tag>/`: parquet partitioned by the bucket
  *     column — the probe's partition-pruned scan unit, one file per
  *     bucket after compaction. Generations are immutable once their
  *     manifest commits; the previous generation is RETAINED until the
  *     next compaction so probes that resolved the old manifest finish
  *     against intact files.
  *   - DELTA (`<path>_delta`): flat parquet carrying `bucket` as a plain
  *     column — each streaming micro-batch appends ONE file here instead
  *     of fanning one tiny file into every touched bucket directory (the
  *     dynamic-partition append measured ~10x the flat write and scales
  *     with bucket width).
  *   - FOLD (`<path>_fold`): the delta snapshot a compaction is folding.
  *     Compaction ATOMICALLY RENAMES the whole delta directory here, so
  *     appends racing the snapshot either land before the rename (their
  *     file moves with the directory and is folded) or fail their job
  *     commit and retry into a fresh delta ([[appendDelta]] retries) —
  *     no append is ever silently lost and none is folded twice.
  *
  * Probes read base (partition-pruned) plus delta and fold rows filtered
  * on the same bucket set (predicate-pushed column filter — no pruning,
  * but both are small by construction: they only hold appends since the
  * last fold, the classic L0 contract).
  *
  * Concurrency contract: APPENDS AND PROBES ARE SAFE CONCURRENTLY WITH
  * COMPACTION — this replaces the previous writer-quiesce requirement.
  * A probe never observes a half-swapped base (the manifest flips
  * atomically and the superseded generation is retained one cycle); an
  * append racing the delta snapshot retries into the next delta epoch.
  * Two compactions must still not run concurrently as a matter of
  * wasted work, but they cannot corrupt anything: each writes its own
  * uniquely-named base directory and the manifest commit arbitrates —
  * exactly one wins, the other throws and its orphan directory is
  * removed by a later prune.
  *
  * FILESYSTEM REQUIREMENT: the whole concurrency contract rests on
  * atomic creates and renames — the manifest's temp-write+rename, the
  * delta→fold directory rename, and rename-to-existing returning false.
  * These hold on HDFS and local filesystems but NOT on object stores
  * (S3A's rename is a non-atomic copy+delete: a file appended mid-rename
  * can be silently lost and two committers can both "win"). The commit
  * paths therefore REFUSE to run on schemes known to emulate rename
  * ([[atomicRenameScheme]]); on such stores run the index under the
  * writer-quiesce contract instead (single maintenance owner, no
  * concurrent appendDelta during compaction) via a rename-atomic staging
  * filesystem, or put the index on HDFS — "may live off-cluster" means
  * any rename-atomic FileSystem, not any FileSystem.
  *
  * Crash recovery favors NO LOSS over no-duplicates: a crash between the
  * manifest commit and the fold cleanup leaves folded rows in both
  * levels; probes may transiently double-count a row (for near-dup
  * candidacy at min-shared=1 this changes nothing — a duplicated row
  * only re-reports an existing match), and the next compaction removes
  * the duplicates via `dedupKeys`. A crash before the manifest commit
  * leaves a dead base directory that the next successful prune deletes.
  * At 100 TB use [[compactBucketedIncremental]]: only delta-touched
  * buckets rewrite, untouched buckets transfer into the new generation
  * by link/copy — O(touched) write amplification under the same
  * all-or-nothing manifest commit.
  */
object IndexMaintenance {

  /** The L0 append location for a bucketed index at `path`. */
  def deltaPath(path: String): String = path + "_delta"

  /** The delta snapshot a compaction is currently folding. */
  def foldPath(path: String): String = path + "_fold"

  private val ManifestPrefix = "MANIFEST-"

  private def fs(spark: SparkSession, p: Path): FileSystem =
    // the PATH's filesystem, not defaultFS (index may live off-cluster —
    // on any rename-atomic FileSystem; see the object scaladoc)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Whether `scheme` provides the atomic rename the commit paths rely
    * on. Object-store connectors emulate rename as copy+delete, which
    * breaks both the manifest's exactly-one-winner arbitration and the
    * delta-snapshot no-lost-append guarantee.
    */
  private[graft] def atomicRenameScheme(scheme: String): Boolean =
    scheme == null || !Set(
      "s3", "s3a", "s3n", "gs", "wasb", "wasbs", "abfs", "abfss",
      "oss", "cosn", "swift").contains(scheme.toLowerCase)

  private def requireAtomicRename(f: FileSystem, what: String): Unit = {
    // FileSystem.getScheme's base implementation THROWS — a connector
    // that never overrides it is treated as unknown, and unknown is
    // allowed (the set above is a denylist of known-emulated renames)
    val scheme = scala.util.Try(f.getScheme).getOrElse(null)
    require(atomicRenameScheme(scheme),
      s"$what requires an atomic-rename filesystem (HDFS/local); " +
        s"scheme '$scheme' emulates rename as copy+delete, which " +
        "breaks the manifest/fold concurrency contract. Host the index " +
        "on a rename-atomic store, or run single-writer quiesced " +
        "maintenance against a staging filesystem and publish the result.")
  }

  private def hasParquet(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    val f = fs(spark, p)
    try f.exists(p) &&
      f.listStatus(p).exists(_.getPath.getName.endsWith(".parquet"))
    catch {
      // a compaction may delete the dir between exists and listStatus
      case _: java.io.FileNotFoundException => false
    }
  }

  /** Manifest generations present at `path`, ascending. */
  private def manifestGens(f: FileSystem, root: Path): Seq[Long] =
    if (!f.exists(root)) Nil
    else f.listStatus(root).toSeq.map(_.getPath.getName)
      .filter(_.startsWith(ManifestPrefix))
      .flatMap(n => scala.util.Try(
        n.stripPrefix(ManifestPrefix).toLong).toOption)
      .sorted

  private def readManifest(f: FileSystem, root: Path, gen: Long): String = {
    val in = f.open(new Path(root, s"$ManifestPrefix$gen"))
    try {
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      var n = in.read(buf)
      while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      new String(bytes.toByteArray, "UTF-8").trim
    } finally in.close()
  }

  /** Resolve the live base directory of an index: the newest manifest
    * names it. A directory holding parquet partition dirs but no
    * manifest is a LEGACY flat index and is its own base (first
    * compaction migrates it into the generational layout).
    */
  def currentBase(spark: SparkSession, path: String): String = {
    val root = new Path(path)
    val f = fs(spark, root)
    val gens = manifestGens(f, root)
    if (gens.isEmpty) path else path + "/" + readManifest(f, root, gens.last)
  }

  /** Atomically commit MANIFEST-<gen> (temp file + rename-to-new-name).
    * Exactly one committer can win a generation. After winning, the
    * commit VERIFIES its base directory still exists: the prune grace
    * window (see [[prune]]) already protects a written-but-uncommitted
    * base from a concurrent compactor's prune, but if that protection is
    * ever breached (clock skew, an operator's manual delete) the losing
    * outcome must be a loud failure here — with the just-committed
    * manifest withdrawn — not a live manifest pointing at nothing.
    */
  private def commitManifest(spark: SparkSession, path: String, gen: Long,
                             baseName: String): Unit = {
    val root = new Path(path)
    val f = fs(spark, root)
    requireAtomicRename(f, "commitManifest")
    f.mkdirs(root)
    val tmp = new Path(root,
      s".manifest_tmp_${java.util.UUID.randomUUID().toString.take(8)}")
    val out = f.create(tmp, false)
    try out.write(baseName.getBytes("UTF-8")) finally out.close()
    val dst = new Path(root, s"$ManifestPrefix$gen")
    if (!f.rename(tmp, dst)) {
      f.delete(tmp, false)
      throw new IllegalStateException(
        s"manifest commit lost the race for $dst — a concurrent " +
          "compaction committed this generation first")
    }
    if (!f.exists(new Path(root, baseName))) {
      f.delete(dst, false) // withdraw before anyone resolves to a ghost
      throw new IllegalStateException(
        s"manifest commit for $dst aborted: base directory $baseName " +
          "disappeared before the commit (deleted by an out-of-band " +
          "prune or operator) — the manifest was withdrawn; re-run the " +
          "compaction")
    }
  }

  /** Drop superseded state: manifests and base directories older than
    * the `retain` newest generations (probes in flight may still hold
    * the previous one; deeper retention buys slower external probes more
    * time between folds), plus base directories referenced by NO
    * retained manifest (orphans of crashed or race-losing compactions)
    * and, once `retain` manifested generations exist, any legacy flat
    * partition dirs at the root.
    *
    * A base_* directory referenced by NO manifest at all is deleted only
    * once it is older than [[OrphanGraceMs]]: a CONCURRENT compaction
    * that has finished writing its base but not yet committed its
    * manifest is never-referenced by construction, and deleting it here
    * would let its commitManifest win a later generation that points at
    * a missing directory. Within the grace window such a dir is either
    * seconds from its commit or a fresh crash — both safe to leave;
    * genuinely dead dirs age out and the NEXT prune removes them. A dir
    * referenced by a SUPERSEDED (dropped) manifest needs no grace — its
    * writer already committed and lost currency, so it deletes at once.
    */
  private def prune(spark: SparkSession, path: String,
                    partitionCol: String, retain: Int = 2): Unit = {
    require(retain >= 2, s"retain=$retain: retain >= 2 is the contract — " +
      "the newest generation for the commit that just landed PLUS the " +
      "previous one an in-flight probe may still hold; retain=1 would " +
      "delete the generation a concurrent probe resolved before our " +
      "commit, reintroducing the vanished-base race the probe-side " +
      "retry only partially papers over")
    val root = new Path(path)
    val f = fs(spark, root)
    val gens = manifestGens(f, root)
    if (gens.isEmpty) return
    val keepGens = gens.takeRight(retain)
    val dropGens = gens.dropRight(retain)
    val keepBases = keepGens.map(readManifest(f, root, _)).toSet
    // a CONCURRENT prune may delete a superseded manifest between our
    // listing and this read — losing the read only costs that base dir
    // one grace-window cycle (it falls into the aged-orphan path), so a
    // vanished manifest must not fail a compaction that already
    // committed
    val supersededBases = dropGens.flatMap(g =>
      scala.util.Try(readManifest(f, root, g)).toOption).toSet
    val now = System.currentTimeMillis()
    dropGens.foreach(g =>
      f.delete(new Path(root, s"$ManifestPrefix$g"), false))
    f.listStatus(root).foreach { st =>
      val name = st.getPath.getName
      val isStaleBase = st.isDirectory && name.startsWith("base_") &&
        !keepBases(name) &&
        (supersededBases(name) ||
          now - st.getModificationTime > OrphanGraceMs)
      val isLegacyPart = st.isDirectory && name.startsWith(partitionCol + "=")
      if (isStaleBase || (isLegacyPart && keepGens.size >= retain))
        f.delete(st.getPath, true)
    }
  }

  /** Write (or batch-append to) an index base. `overwrite` lands a NEW
    * immutable generation and commits its manifest; `append` adds files
    * to the LIVE generation's bucket directories (the legacy
    * dynamic-partition batch path — streaming appends should use
    * [[appendDelta]], which is ~10x cheaper per micro-batch).
    */
  def writeBase(df: DataFrame, path: String,
                partitionCol: String = "bucket",
                mode: String = "overwrite",
                retain: Int = 2): Unit = {
    require(retain >= 2, s"retain=$retain (see prune contract: >= 2)")
    require(mode == "overwrite" || mode == "append",
      s"writeBase supports only overwrite|append, got '$mode' — " +
        "other SaveModes would silently commit a new generation")
    val spark = df.sparkSession
    if (mode == "append") {
      df.write.mode("append").partitionBy(partitionCol)
        .parquet(currentBase(spark, path))
    } else {
      healOrphans(spark, path)
      val root = new Path(path)
      val f = fs(spark, root)
      val gen = manifestGens(f, root).lastOption.getOrElse(0L) + 1
      val baseName =
        s"base_${gen}_${java.util.UUID.randomUUID().toString.take(8)}"
      df.write.mode("overwrite").partitionBy(partitionCol)
        .parquet(s"$path/$baseName")
      commitManifest(spark, path, gen, baseName)
      prune(spark, path, partitionCol, retain)
    }
  }

  /** Append rows (carrying a `bucket` column) to the index's delta as a
    * single flat file — the per-micro-batch write path. If a concurrent
    * compaction snapshots the delta directory mid-commit the write job
    * fails its final rename; the retry lands in the fresh delta, so the
    * append is at-least-once (dedupKeys collapse a rare double-land at
    * the next fold) and never lost.
    */
  def appendDelta(df: DataFrame, path: String): Unit = {
    var attempts = 0
    var done = false
    while (!done) {
      attempts += 1
      try {
        df.coalesce(1).write.mode("append").parquet(deltaPath(path))
        done = true
      } catch {
        case scala.util.control.NonFatal(e) if attempts < 3 =>
          // expected cause: a compaction renamed the delta directory
          // out from under this job's commit; the retry lands in the
          // fresh delta. Deterministic failures (schema mismatch,
          // disk full) surface on the final attempt; fatal errors are
          // never swallowed.
          System.err.println("[IndexMaintenance] delta append attempt " +
            s"$attempts for $path failed (retrying): $e")
      }
    }
  }

  /** Read the index rows for a set of buckets: the live base scan
    * partition-prunes to the named directories; delta rows — and fold
    * rows, if a compaction is in flight or crashed mid-fold — ride
    * along through a predicate-pushed filter. Column order follows the
    * base. `partitionCol` names the bucketing column ("bucket" for the
    * hash indexes, "cell" for the IVF-PQ codes).
    */
  def readBucketed(spark: SparkSession, path: String, buckets: Seq[Int],
                   partitionCol: String = "bucket"): DataFrame = {
    val pred = col(partitionCol).isin(buckets.map(Integer.valueOf): _*)
    // extras are LISTED BEFORE the base generation is resolved, and read
    // with ignoreMissingFiles: a fold that commits BEFORE the base
    // resolves is covered by the newer base (at worst a transient
    // double-count, which candidacy tolerates by contract), and delta
    // files deleted mid-probe are skipped instead of failing the scan.
    // RESIDUAL WINDOW (documented, not hidden): a fold that renames the
    // delta between this listing and the probe's action can make those
    // unfolded rows invisible to THIS probe (base already pinned) — the
    // probe is then eventually consistent w.r.t. the newest appends,
    // which near-dup candidacy tolerates (the next probe sees them).
    // Only a MISSING path is swallowed; corrupt or schema-broken extras
    // still fail loudly (silently dropping every unfolded row would be
    // wrong results, not a race).
    def readIfPresent(dir: String) =
      try Some(spark.read.option("ignoreMissingFiles", "true").parquet(dir)
        .filter(pred))
      catch {
        case _: java.io.FileNotFoundException => None
        // PATH_NOT_FOUND: dir deleted after the hasParquet check.
        // UNABLE_TO_INFER_SCHEMA: dir recreated but holding only an
        // in-flight append's staging files — zero committed rows, i.e.
        // the same race one beat later, not corruption (a corrupt
        // committed file fails footer/decode with OTHER errors and
        // still surfaces loudly).
        case e: org.apache.spark.sql.AnalysisException
            if e.getCondition == "PATH_NOT_FOUND" ||
              e.getCondition == "UNABLE_TO_INFER_SCHEMA" => None
      }
    val extras = Seq(deltaPath(path), foldPath(path)).flatMap { d =>
      if (!hasParquet(spark, d)) None else readIfPresent(d)
    }
    // base resolution retries once on a vanished generation: a probe
    // arriving with compactions at a faster cadence than its own (e.g.
    // compactEvery=1 folds racing an external probe) can resolve a
    // generation that prune deletes before the listing; re-resolving
    // currentBase lands on the newer, intact generation. Deeper
    // protection for chronically slow probes is the `retain` knob on
    // the compact* calls (retain N generations instead of 2).
    def resolveBase(attempt: Int): DataFrame =
      try spark.read.parquet(currentBase(spark, path)).filter(pred)
      catch {
        case e @ (_: java.io.FileNotFoundException |
                  _: org.apache.spark.sql.AnalysisException)
            if attempt < 2 && (e match {
              case a: org.apache.spark.sql.AnalysisException =>
                a.getCondition == "PATH_NOT_FOUND"
              case _ => true
            }) => resolveBase(attempt + 1)
      }
    val base = resolveBase(0)
    extras.foldLeft(base)((acc, e) =>
      acc.unionByName(e.select(base.columns.map(col).toIndexedSeq: _*)))
  }

  /** Fold the delta into a NEW base generation, one file per bucket
    * directory, and flip the manifest. Safe against concurrent appends
    * and probes (see the object scaladoc); call it from one maintenance
    * job at a time — a second concurrent compaction fails loudly at the
    * manifest commit and wastes its rewrite, nothing more.
    *
    * Crash windows all self-heal on the next call: a stranded fold dir
    * re-folds first (`dedupKeys` collapses any rows that already made it
    * into a base); a dead base directory without a committed manifest is
    * pruned; a missing fold cleanup re-folds the same rows and dedups.
    */
  def compactBucketed(spark: SparkSession, path: String,
                      dedupKeys: Seq[String] = Nil,
                      partitionCol: String = "bucket",
                      retain: Int = 2): Unit = {
    require(retain >= 2, s"retain=$retain (see prune contract: >= 2)")
    healOrphans(spark, path)
    // crash leftover: a stranded fold is folded before touching the delta
    if (hasParquet(spark, foldPath(path)))
      foldOnce(spark, path, dedupKeys, partitionCol, retain)
    snapshotDelta(spark, path)
    foldOnce(spark, path, dedupKeys, partitionCol, retain)
  }

  /** Snapshot the delta directory to the fold location by atomic rename.
    * A leftover fold dir holding NO committed parquet (crash litter —
    * only staging files from an append that died mid-job) is deleted
    * first: Hadoop rename into an EXISTING directory nests the source
    * inside it, and the later fold cleanup would then destroy committed
    * appends. A fold dir WITH parquet must have been folded by the
    * caller's heal step before this runs.
    */
  private def snapshotDelta(spark: SparkSession, path: String): Unit = {
    val f = fs(spark, new Path(path))
    requireAtomicRename(f, "snapshotDelta")
    val dp = new Path(deltaPath(path))
    if (!f.exists(dp)) return
    val fp = new Path(foldPath(path))
    if (f.exists(fp)) {
      require(!hasParquet(spark, foldPath(path)),
        s"snapshotDelta: $fp still holds committed rows — fold it first")
      f.delete(fp, true)
    }
    require(f.rename(dp, fp),
      s"compact: delta snapshot rename $dp -> $fp failed")
  }

  /** Delete base_* directories left behind by a crashed FIRST write or
    * legacy migration (no manifest was committed, so the orphan's inputs
    * — the legacy flat layout and/or the fold — are intact and deleting
    * it is always safe). Without this, partition discovery over a
    * legacy root that gained a half-written base_* subdir fails with
    * "conflicting directory structures" and never self-heals. Probes
    * hitting that one-time window fail until the next maintenance call
    * runs this heal — the legacy-migration caveat; manifested indexes
    * never re-enter it.
    */
  /** How old an unmanifested base_* directory must be before the heal
    * will delete it. A first writer that takes longer than this between
    * its base write and its manifest commit is outside the mechanism's
    * protection — but a base write's last mtime IS roughly its commit
    * time, so in practice only a crashed write ever ages past it.
    */
  private val OrphanGraceMs = 10L * 60 * 1000

  private def healOrphans(spark: SparkSession, path: String): Unit = {
    val root = new Path(path)
    val f = fs(spark, root)
    if (f.exists(root) && manifestGens(f, root).isEmpty) {
      val now = System.currentTimeMillis()
      val orphans = f.listStatus(root).filter(st =>
        st.isDirectory && st.getPath.getName.startsWith("base_") &&
          // grace period closes the heal-vs-first-writer race at the
          // MECHANISM level: a dir a concurrent first write is still
          // producing (or just committed) is minutes old at most; only
          // genuinely crashed writes age past the grace window. Until
          // then a crashed legacy migration keeps its orphan (reads on
          // an unmanifested root may fail during that window — the
          // documented one-time migration caveat).
          now - st.getModificationTime > OrphanGraceMs)
      // re-check AFTER listing: a manifest committed in between makes
      // one of these dirs live
      if (manifestGens(f, root).isEmpty)
        orphans.foreach(st => f.delete(st.getPath, true))
    }
  }

  /** One-row inspection of an index root's manifest/GC state — the
    * auditable face of the retention contract ([[prune]]): how many
    * manifests and base generations are retained, the live generation
    * number, how many base_* dirs no retained manifest references
    * (orphans of crashed or race-losing compactions, destined for the
    * next prune once aged), and how many committed parquet files sit in
    * the L0 delta / fold. After a clean compaction cycle the invariants
    * are exact: `retain` manifests, `retain` bases, zero orphans, zero
    * delta/fold files — the catalog's GC entry pins them against a
    * replayable oracle. Driver-side listing only (bounded by retention
    * depth + crash litter, never by index size).
    */
  def manifestStats(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val root = new Path(path)
    val f = fs(spark, root)
    // same race prune guards against: a concurrent compaction's prune may
    // delete a superseded manifest between our listing and the reads — an
    // audit must report the surviving state (vanished manifests counted
    // absent), not throw FileNotFoundException. ONLY that race is
    // swallowed: any other read failure (corrupt file, IO/permission
    // error) must surface, or a damaged index would audit as a
    // healthy-but-older one
    val surviving = manifestGens(f, root).flatMap { g =>
      try Some(g -> readManifest(f, root, g))
      catch { case _: java.io.FileNotFoundException => None }
    }
    val gens = surviving.map(_._1)
    val referenced = surviving.map(_._2).toSet
    val baseDirs =
      if (!f.exists(root)) Seq.empty[String]
      else f.listStatus(root).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("base_"))
        .map(_.getPath.getName)
    def parquetCount(dir: String): Long = {
      val p = new Path(dir)
      if (!f.exists(p)) 0L
      else f.listStatus(p).count(st =>
        st.isFile && st.getPath.getName.endsWith(".parquet")).toLong
    }
    Seq((gens.size.toLong, gens.lastOption.getOrElse(0L),
      baseDirs.size.toLong,
      baseDirs.count(d => !referenced(d)).toLong,
      parquetCount(deltaPath(path)), parquetCount(foldPath(path))))
      .toDF("n_manifests", "live_gen", "n_bases", "n_orphans",
        "delta_files", "fold_files")
  }

  /** [[compactBucketed]] with a BOUNDED rewrite unit — the 100 TB form:
    * only the bucket directories the delta actually touched are re-read
    * and rewritten (a partition-pruned scan); every untouched bucket of
    * the previous generation transfers into the new one by hard link
    * (content copy where the filesystem can't link). Write
    * amplification drops from O(index) to O(touched buckets) per fold,
    * while the manifest commit keeps the all-or-nothing snapshot
    * semantics — probes still flip atomically between complete
    * generations. On an object store the link step becomes manifest-
    * level file reuse (reference the same objects from the new
    * generation's listing), which is the same idea one representation
    * down. Falls back to a plain full fold when there is no manifested
    * generation yet (legacy layout migration needs the full rewrite).
    */
  def compactBucketedIncremental(spark: SparkSession, path: String,
                                 dedupKeys: Seq[String] = Nil,
                                 partitionCol: String = "bucket",
                                 retain: Int = 2): Unit = {
    require(retain >= 2, s"retain=$retain (see prune contract: >= 2)")
    val root = new Path(path)
    val f = fs(spark, root)
    if (manifestGens(f, root).isEmpty) {
      compactBucketed(spark, path, dedupKeys, partitionCol, retain)
      return
    }
    if (hasParquet(spark, foldPath(path)))
      foldIncremental(spark, path, dedupKeys, partitionCol, retain)
    val dp = new Path(deltaPath(path))
    if (f.exists(dp)) {
      snapshotDelta(spark, path)
      foldIncremental(spark, path, dedupKeys, partitionCol, retain)
    }
  }

  private def foldIncremental(spark: SparkSession, path: String,
                              dedupKeys: Seq[String],
                              partitionCol: String,
                              retain: Int = 2): Unit = {
    val root = new Path(path)
    val f = fs(spark, root)
    val prevBase = currentBase(spark, path)
    // touched buckets: bounded by bucket width (driver-side list, the
    // same boundedness class as the probes' bucket collects)
    val touched: Set[Int] =
      if (!hasParquet(spark, foldPath(path))) Set.empty
      else spark.read.parquet(foldPath(path))
        .select(col(partitionCol).cast("int")).distinct()
        .collect().map(_.getInt(0)).toSet
    if (touched.isEmpty) { // nothing to fold — drop any empty fold dir
      f.delete(new Path(foldPath(path)), true)
      return
    }
    val gen = manifestGens(f, root).lastOption.getOrElse(0L) + 1
    val baseName =
      s"base_${gen}_${java.util.UUID.randomUUID().toString.take(8)}"
    val newBase = new Path(root, baseName)
    // 1. rewrite ONLY the touched buckets: pruned base scan ∪ fold rows
    val pred = col(partitionCol)
      .isin(touched.toSeq.map(Integer.valueOf): _*)
    val base = spark.read.parquet(prevBase).filter(pred)
    val all = base.unionByName(spark.read.parquet(foldPath(path))
      .filter(pred).select(base.columns.map(col).toIndexedSeq: _*))
    val deduped =
      if (dedupKeys.nonEmpty) all.dropDuplicates(dedupKeys) else all
    deduped.repartition(col(partitionCol))
      .write.mode("overwrite").partitionBy(partitionCol)
      .parquet(newBase.toString)
    // 2. transfer untouched buckets from the previous generation by
    // hard link (parquet files are immutable; copy where linking fails)
    val prevPath = new Path(prevBase)
    f.listStatus(prevPath).foreach { st =>
      val name = st.getPath.getName
      // an unparsable partition value (e.g. __HIVE_DEFAULT_PARTITION__
      // from a null bucket written out-of-band) can never match the
      // Int-typed touched set — transfer it verbatim instead of
      // aborting the whole compaction on a NumberFormatException
      val bucketOfDir = scala.util.Try(
        name.stripPrefix(partitionCol + "=").toInt).toOption
      if (st.isDirectory && name.startsWith(partitionCol + "=") &&
          !bucketOfDir.exists(touched.contains)) {
        val dstDir = new Path(newBase, name)
        f.mkdirs(dstDir)
        f.listStatus(st.getPath).foreach { fileSt =>
          if (fileSt.isFile) {
            val dstFile = new Path(dstDir, fileSt.getPath.getName)
            val linked = f.getScheme == "file" && {
              try {
                java.nio.file.Files.createLink(
                  java.nio.file.Paths.get(dstFile.toUri.getPath),
                  java.nio.file.Paths.get(fileSt.getPath.toUri.getPath))
                true
              } catch {
                case _: UnsupportedOperationException |
                     _: java.nio.file.FileSystemException => false
              }
            }
            if (!linked)
              org.apache.hadoop.fs.FileUtil.copy(f, fileSt.getPath,
                f, dstFile, false,
                spark.sparkContext.hadoopConfiguration)
          }
        }
      }
    }
    commitManifest(spark, path, gen, baseName)
    f.delete(new Path(foldPath(path)), true)
    prune(spark, path, partitionCol, retain)
  }

  private def foldOnce(spark: SparkSession, path: String,
                       dedupKeys: Seq[String],
                       partitionCol: String,
                       retain: Int = 2): Unit = {
    val root = new Path(path)
    val f = fs(spark, root)
    val base = spark.read.parquet(currentBase(spark, path))
    val all =
      if (hasParquet(spark, foldPath(path)))
        base.unionByName(spark.read.parquet(foldPath(path))
          .select(base.columns.map(col).toIndexedSeq: _*))
      else base
    val deduped =
      if (dedupKeys.nonEmpty) all.dropDuplicates(dedupKeys) else all
    val gen = manifestGens(f, root).lastOption.getOrElse(0L) + 1
    val baseName =
      s"base_${gen}_${java.util.UUID.randomUUID().toString.take(8)}"
    deduped.repartition(col(partitionCol))
      .write.mode("overwrite").partitionBy(partitionCol)
      .parquet(s"$path/$baseName")
    commitManifest(spark, path, gen, baseName)
    f.delete(new Path(foldPath(path)), true)
    prune(spark, path, partitionCol, retain)
  }
}

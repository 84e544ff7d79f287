package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ops.SimilarityOps

/** The IVF scale path must be real: the index write partitions the corpus
  * by LSH bucket, and probing reads ONLY the probed bucket directories
  * (PartitionFilters in the scan), returning the same top-k as the
  * unpartitioned bucket-join formulation.
  */
class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 4
  private val bits = 2

  private def vecs(n: Int, seed: Int) = (0 until n).map { i =>
    val v = Array.tabulate(dim)(d =>
      (((i * 31 + d * 17 + seed) % 13) - 6).toFloat / 3f)
    (i.toLong + seed * 1000L, v)
  }.toDF("vec_id", "embedding")

  test("index write + probe prunes partitions and matches ivfTopK") {
    val dir = Files.createTempDirectory("ivf_idx").toString
    val corpus = vecs(60, seed = 1)
    val queries = vecs(3, seed = 2)
    SimilarityOps.writeIvfIndex(corpus, dir, dim, bits)

    // written layout: a manifested base generation of bucket=N directories
    val base = graft.ops.IndexMaintenance.currentBase(spark, dir)
    assert(base != dir, "writeIvfIndex should commit a manifest")
    val buckets = new java.io.File(base).list().filter(_.startsWith("bucket="))
    assert(buckets.nonEmpty && buckets.length <= (1 << bits))

    val probed = SimilarityOps.ivfIndexTopK(spark, dir, queries, k = 3,
      dim = dim, bits = bits)
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("bucket"), s"expected pruned scan:\n$plan")

    val reference = SimilarityOps.ivfTopK(queries, corpus, k = 3,
      dim = dim, bits = bits)
    val a = probed.collect().map(r => (r.getLong(0), r.getInt(3)) ->
      r.getLong(1)).toMap
    val b = reference.collect().map(r => (r.getLong(0), r.getInt(3)) ->
      r.getLong(1)).toMap
    assert(a === b)
  }

  test("incremental append: new vectors land in probe-able buckets; " +
      "compaction folds files and preserves probe results") {
    import java.nio.file.Paths
    import scala.jdk.CollectionConverters._
    val dir = Files.createTempDirectory("ivf_idx_app").toString
    SimilarityOps.writeIvfIndex(vecs(40, seed = 1), dir, dim, bits)
    // append a batch CONTAINING the query vectors themselves: the probe
    // must surface them as exact matches (cos_sim 1.0 at rank 1)
    val queries = vecs(3, seed = 7)
    SimilarityOps.appendIvfIndex(
      queries.withColumn("vec_id", col("vec_id") + 500000L),
      dir, dim, bits)

    // cos_sim ties with colinear corpus vectors are id-tiebroken, so
    // assert membership-with-similarity-1 rather than rank 1
    def topHits() = SimilarityOps.ivfIndexTopK(spark, dir, queries, k = 50,
      dim = dim, bits = bits)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    val hits = topHits()
    queries.collect().map(_.getLong(0)).foreach { q =>
      assert(hits.get((q, q + 500000L)).contains(1.0),
        s"query $q should find its appended clone at cos_sim 1.0")
    }

    def bucketFiles(): Map[String, Int] =
      Files.list(Paths.get(
          graft.ops.IndexMaintenance.currentBase(spark, dir)))
        .iterator().asScala
        .filter(_.getFileName.toString.startsWith("bucket="))
        .map(p => p.getFileName.toString ->
          Files.list(p).iterator().asScala
            .count(_.getFileName.toString.endsWith(".parquet"))).toMap
    // appends land as one flat file in the L0 delta, NOT as a tiny file
    // per touched bucket directory (IndexMaintenance layout)
    val delta = Paths.get(graft.ops.IndexMaintenance.deltaPath(dir))
    assert(Files.list(delta).iterator().asScala
      .count(_.getFileName.toString.endsWith(".parquet")) === 1,
      "append should write exactly one delta file")
    assert(bucketFiles().values.forall(_ === 1),
      "append must not fan files into the bucket directories")
    SimilarityOps.compactIvfIndex(spark, dir)
    assert(!Files.exists(delta), "compaction should clear the delta")
    assert(bucketFiles().values.forall(_ === 1), bucketFiles().toString)
    assert(topHits() === hits)
  }

  test("multi-probe reads more buckets but stays pruned") {
    val dir = Files.createTempDirectory("ivf_idx_mp").toString
    SimilarityOps.writeIvfIndex(vecs(60, seed = 1), dir, dim, bits)
    val out = SimilarityOps.ivfIndexTopK(spark, dir, vecs(2, seed = 2),
      k = 3, dim = dim, bits = bits, multiProbe = true)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"))
    assert(out.count() > 0)
  }
}

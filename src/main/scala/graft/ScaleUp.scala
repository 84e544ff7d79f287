package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale a testdata SF directory up by an integer factor for local
  * scaling probes (`runMain graft.ScaleUp <inDir> <outDir> <factor>`):
  * fact tables are unioned `factor` times with disjoint id shifts so key
  * cardinalities grow with the data (not just row multiplicity), dims are
  * copied as-is (the TPC-H-ish shape: facts grow, dims stay bounded).
  *
  * Cross-copy structure is deliberately de-duplicated where it would
  * degenerate: each document copy gets a per-copy suffix token so the
  * near-dup profile stays ~constant per row instead of every doc becoming
  * a factor-sized duplicate clique; embeddings keep their values (ANN
  * cost depends on counts, not coordinates). Event/order/lineitem keys
  * shift by the observed max so joins stay consistent within each copy.
  * The optional `bounded` mode (see below) strengthens the de-dup to a
  * per-copy word bijection for CC scale campaigns where even the residual
  * cross-copy banding of the suffix mode distorts the edge-count slope.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val Array(inDir, outDir, factorStr) = args.take(3)
    val factor = factorStr.toInt
    require(factor >= 2, s"factor $factor")
    // optional 4th arg: append this many synthetic SINGLETON documents
    // (globally unique words -> no shared shingles -> every minhash band
    // bucket has one member) with ids in the doc_id % 11 == 3 stratum —
    // the high-diameter chain variant for the CC straggler-regime bench
    // (`dedup_clusters_chain` links consecutive singleton stratum ids
    // into a path; ScaleUp'd corpora otherwise band nearly every doc
    // into a cross-copy clique, leaving ~4 singletons at sf1). Injection
    // happens AFTER the copy fan-out so the injected docs are not
    // themselves near-dup'd across copies.
    val rest = args.drop(3)
    // optional literal "bounded" (any position after factor): BOUNDED-
    // CLIQUE copy mode for honest big-decade CC measurements. The default
    // per-copy suffix token leaves enough shared shingles that copies
    // band with their originals, so near-dup cliques — and the candidate
    // PAIR set — grow ~quadratically with the factor (the r15 sf30 CC
    // cells measured that fixture artifact, not the operator). Bounded
    // mode instead applies a per-copy WORD BIJECTION (prefix every word
    // with a copy tag): within-copy shingle sets are isomorphic to the
    // source's, so within-copy Jaccard — and the near-dup clique profile
    // — is EXACTLY the source's, while cross-copy Jaccard is 0 (no
    // shared words → no shared shingles → no banding). Edge count then
    // grows linearly with the factor and clique size stays constant
    // (measured: 508 edges at sf0.1 → 5110 at a single-pass ×10).
    //
    // The tag must keep the word mapping INJECTIVE across copies AND
    // across CHAINED ScaleUp passes: a bare "c$i" prefix collides when
    // passes compose ("c1" + w on a pass-2 copy of an UNTAGGED pass-1
    // word equals pass-1's own "c1"-tagged word — measured as 2.4x
    // super-linear edges on a chained sf3b). Hence (a) a per-invocation
    // nonce (the output dir's basename) namespaces passes, and (b) a
    // "_" terminator after the copy index prevents "C1" from being a
    // prefix of "C12" within a pass.
    val bounded = rest.contains("bounded")
    val boundedTag = new java.io.File(outDir).getName
    val chainDocs = rest.filterNot(_ == "bounded").headOption
      .map(_.toInt).getOrElse(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.parquet.datetimeRebaseModeInWrite", "CORRECTED")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def copies(df: DataFrame, shiftCols: Seq[String],
               perCopy: (DataFrame, Int) => DataFrame = (d, _) => d)
        : DataFrame = {
      val shifts: Map[String, Long] = shiftCols.map { c =>
        val row = df.agg(max(col(c))).collect().head
        require(!row.isNullAt(0), s"empty table: cannot shift on $c")
        c -> (row.getLong(0) + 1L)
      }.toMap
      (0 until factor).map { i =>
        val shifted = shiftCols.foldLeft(df) { (d, c) =>
          d.withColumn(c, col(c) + lit(shifts(c) * i))
        }
        perCopy(shifted, i)
      }.reduce(_ unionByName _)
    }

    def write(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      println(s"[scaleup] $name: ${spark.read.parquet(s"$outDir/$name.parquet").count()} rows")
    }

    // dims: copy unchanged (facts reference them unshifted)
    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      write(spark.read.parquet(s"$inDir/$t.parquet"), t)
    }

    val orders = spark.read.parquet(s"$inDir/orders.parquet")
    write(copies(orders, Seq("o_orderkey")), "orders")

    val lineitem = spark.read.parquet(s"$inDir/lineitem.parquet")
    // cross-table shift consistency: orders and lineitem shift their
    // (shared) order key independently from each table's observed max —
    // if the maxes ever diverge (an order with no lineitems at the tail)
    // every copied lineitem would join the wrong order, silently
    val maxO = orders.agg(max(col("o_orderkey"))).collect().head.getLong(0)
    val maxL = lineitem.agg(max(col("l_orderkey"))).collect().head
      .getLong(0)
    require(maxO == maxL,
      s"orderkey max mismatch orders=$maxO lineitem=$maxL: shifted " +
        "copies would break the orders-lineitem join")
    write(copies(lineitem, Seq("l_orderkey")), "lineitem")

    // events: NANOS timestamps — must read via Tables.events' conf; keys
    // shift, timestamps stay (density grows, span fixed)
    val events = Tables.events(spark, inDir)
    write(copies(events, Seq("event_id")), "events")

    val documents = spark.read.parquet(s"$inDir/documents.parquet")
    def perCopyText(d: DataFrame, i: Int): DataFrame =
      if (i == 0) d
      else if (bounded) d.withColumn("text",
        array_join(transform(split(col("text"), " "),
          w => concat(lit(s"${boundedTag}C${i}_"), w)), " "))
      else d.withColumn("text", concat(col("text"), lit(s" rep$i")))
    val docsScaled = copies(documents, Seq("doc_id"), perCopyText)
    val docsOut = if (chainDocs == 0) docsScaled else {
      // max scaled id DERIVED from the source max and the known copy
      // shift ((maxSrc+1) per copy) instead of an agg over docsScaled —
      // that agg recomputed the whole fan-out a second time before the
      // write, and getLong(0) on an empty input threw an opaque NPE
      val srcRow = documents.agg(max(col("doc_id"))).collect().head
      require(!srcRow.isNullAt(0),
        "empty documents input: cannot inject chain docs")
      val maxSrc = srcRow.getLong(0)
      val maxId = maxSrc + (maxSrc + 1L) * (factor - 1L)
      // smallest id > maxId with id % 11 == 3; step 11 keeps the whole
      // injected block inside the stratum, ids ascending
      val base = (maxId / 11 + 1) * 11 + 3
      val inject = spark.range(chainDocs.toLong).select(
          (lit(base) + col("id") * 11L).as("doc_id"),
          concat_ws(" ", (0 until 40).map(j =>
            concat(lit("chain"), col("id"), lit(s"w$j"))): _*).as("text"),
          lit("zh").as("lang"), lit("src0").as("source"))
        .withColumn("n_chars", length(col("text")).cast("long"))
      docsScaled.unionByName(inject)
    }
    write(docsOut, "documents")

    val embeddings = spark.read.parquet(s"$inDir/embeddings.parquet")
    write(copies(embeddings, Seq("vec_id")), "embeddings")

    spark.stop()
  }
}

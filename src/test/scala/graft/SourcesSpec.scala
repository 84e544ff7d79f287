package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.sources.Sources

/** Batch source/sink surfaces (SURVEY.md §2.1 S8/K2): CSV header +
  * schema-inference roundtrip, CSV column pruning, and the partitioned
  * parquet sink's physical layout.
  */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("csv with header roundtrips rows and inferred types") {
    val dir = Files.createTempDirectory("csvsrc").toString
    val df = Seq((1L, "alpha", 1.5), (2L, "beta", -0.25), (3L, "g,amma", 2.0))
      .toDF("id", "name", "score")
    df.write.option("header", true).mode("overwrite").csv(s"$dir/t")

    val back = Sources.csv(spark, s"$dir/t")
    assert(back.schema("id").dataType.typeName === "integer" ||
      back.schema("id").dataType.typeName === "long")
    assert(back.schema("score").dataType.typeName === "double")
    assert(back.count() === 3)
    // quoted comma survives the roundtrip
    assert(back.filter($"id" === 3).select("name").as[String].head ===
      "g,amma")
  }

  test("csv scan prunes to the projected columns") {
    val dir = Files.createTempDirectory("csvprune").toString
    (1 to 100).map(i => (i, s"n$i", i * 1.0, s"x$i"))
      .toDF("id", "name", "score", "extra")
      .write.option("header", true).mode("overwrite").csv(s"$dir/t")
    val plan = Sources.csv(spark, s"$dir/t").select("id", "score")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema"), plan)
    assert(!plan.substring(plan.indexOf("ReadSchema")).contains("extra"),
      s"scan should not read unprojected columns:\n$plan")
  }

  test("partitioned parquet sink round-trips with layout (K2)") {
    val dir = Files.createTempDirectory("sink").toString
    val df = Seq(("ETH", 1, 10.0), ("ETH", 2, 11.0), ("SOL", 1, 5.0))
      .toDF("symbol", "seq", "price")
    Sources.writeParquet(df, s"$dir/out", partitionBy = Seq("symbol"))
    // physical layout: one directory per key
    assert(Files.exists(Paths.get(s"$dir/out/symbol=ETH")))
    assert(Files.exists(Paths.get(s"$dir/out/symbol=SOL")))
    val back = Sources.parquet(spark, s"$dir/out")
    assert(back.count() === 3)
    assert(back.filter($"symbol" === "ETH").agg(sum($"price"))
      .collect().head.getDouble(0) === 21.0)
  }

  test("orc roundtrips schema and rows; filter pushes to the scan (S9)") {
    val dir = Files.createTempDirectory("orcsrc").toString
    val df = Seq((1L, "ETH", 10.5), (2L, "SOL", 5.25), (3L, "ETH", 11.0))
      .toDF("id", "symbol", "price")
    Sources.writeOrc(df, s"$dir/t")

    val back = Sources.orc(spark, s"$dir/t")
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      df.schema.map(f => (f.name, f.dataType)))
    assert(back.count() === 3)
    assert(back.filter($"symbol" === "ETH").agg(sum($"price"))
      .collect().head.getDouble(0) === 21.5)

    // pushdown contract: the predicate reaches the ORC scan
    val plan = back.filter($"id" > 1L).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,1)]"),
      s"filter should push into the ORC scan:\n$plan")
  }

  test("quarantining JSON read splits clean/corrupt records and reports " +
      "corrupt files (S4)") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("jsonq")
    Files.writeString(Paths.get(dir.toString, "clean.json"),
      """{"id": 1, "n": 10}
        |{"id": 2, "n": 20}
        |""".stripMargin)
    Files.writeString(Paths.get(dir.toString, "mixed.json"),
      """{"id": 3, "n": 30}
        |{"id": 4, "n":
        |not json at all
        |
        |{"id": 5, "n": "oops"}
        |{"id": 6, "n": 60}
        |""".stripMargin)
    // .gz extension, not gzip bytes: the reference's magic-sniff case
    Files.write(Paths.get(dir.toString, "corrupt.json.gz"),
      "definitely not gzip".getBytes("UTF-8"))

    val schema = new StructType().add("id", LongType).add("n", LongType)
    val (parsed, report) =
      Sources.jsonQuarantinedWithReport(spark, schema, dir.toString)
    val (good, bad) = Sources.splitQuarantine(parsed)

    // file-level: exactly the fake-gzip file, with a magic-byte reason
    assert(report.map(_._1.stripPrefix("file:")) ===
      Seq(Paths.get(dir.toString, "corrupt.json.gz").toString))
    assert(report.head._2.contains("magic"), report.head._2)

    // aggregate-only on each side of the split: this is the plan shape
    // the raw-JSON-datasource read could not run (pruning down to only
    // the corrupt-record column is disallowed) — it must just work here
    assert(good.count() === 4L) // ids 1,2,3,6; blank line dropped
    assert(bad.count() === 3L)  // truncated, garbage, type-mismatch

    assert(good.select("id").as[Long].collect().sorted.toSeq ===
      Seq(1L, 2L, 3L, 6L))
    assert(good.agg(sum($"n")).collect().head.getLong(0) === 120L)

    // quarantined rows keep raw text + provenance
    val badRows = bad.select("_src_file", "_corrupt_record")
      .as[(String, String)].collect().toSeq
    assert(badRows.forall(_._1.endsWith("mixed.json")))
    assert(badRows.map(_._2).exists(_.contains("not json at all")))
    // PERMISSIVE keeps partially-parsed fields on the quarantined side
    assert(bad.filter($"_corrupt_record".contains("oops"))
      .select("id").as[Long].head() === 5L)

    // good+bad aggregated in one plan (the s4_quarantine_stats shape)
    val stats = good.agg(count(lit(1)).as("n_good"))
      .crossJoin(bad.agg(count(lit(1)).as("n_bad")))
      .collect().head
    assert((stats.getLong(0), stats.getLong(1)) === ((4L, 3L)))
  }

  test("multiLine JSON array file parses to one row per element (S5)") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("jsonarr")
    Files.writeString(Paths.get(dir.toString, "tweets.json"),
      """[
        |  {"id": 1, "text": "hello", "crypto_key": "ETH"},
        |  {"id": 2, "text": "world", "crypto_key": null},
        |  {"id": 3, "text": "again", "crypto_key": "SOL"}
        |]""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType),
      StructField("crypto_key", StringType)))
    val df = Sources.jsonArray(spark, schema, dir.toString)
    assert(df.count() === 3L)
    // the reference drops null-keyed records post-parse (P1)
    val keyed = df.filter(col("crypto_key").isNotNull)
      .collect().map(_.getAs[String]("crypto_key")).sorted.toSeq
    assert(keyed === Seq("ETH", "SOL"))
  }
}

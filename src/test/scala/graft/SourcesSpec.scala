package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.sources.Sources

/** Batch source/sink surfaces (SURVEY.md §2.1 S5/S8/K2). */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("csv source with header + inferSchema (S8)") {
    val dir = Files.createTempDirectory("csv").toString
    Files.write(Paths.get(dir, "data.csv"),
      "symbol,price,ts_ms\nETH,3000.5,1704067200000\nSOL,150.25,1704067215000\n"
        .getBytes("UTF-8"))
    val df = Sources.csv(spark, dir)
    assert(df.columns.toSeq === Seq("symbol", "price", "ts_ms"))
    val eth = df.filter($"symbol" === "ETH").collect().head
    assert(eth.getAs[Double]("price") === 3000.5)
    assert(eth.getAs[Long]("ts_ms") === 1704067200000L)
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
}

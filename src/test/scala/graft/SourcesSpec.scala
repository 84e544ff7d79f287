package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Sources

/** S8 CSV scan (the reference's BQ-export -> pandas path): header +
  * schema inference roundtrip, and the scan only reads the projected
  * columns (column pruning reaches the CSV reader like it does parquet).
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
}

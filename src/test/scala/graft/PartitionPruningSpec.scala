package graft

import org.apache.spark.sql.functions._

/** Evidence for SCALE.md's layout claims: date-partitioned parquet makes
  * time-range predicates partition-pruned scans, not filters.
  */
class PartitionPruningSpec extends SparkSpec {
  import spark.implicits._

  test("date-partitioned write + time predicate prunes partitions") {
    val dir = java.nio.file.Files.createTempDirectory("parts").toString
    val df = Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("day", date_format($"ts", "yyyy-MM-dd"))
    df.write.partitionBy("day").mode("overwrite").parquet(s"$dir/events")

    val read = spark.read.parquet(s"$dir/events")
      .filter($"day" === "2024-01-05")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("2024-01-05"),
      s"expected partition filter in scan:\n$plan")
    // pruned scan reads only the one day's rows
    val expected = df.filter($"day" === "2024-01-05").count()
    assert(read.count() === expected)
    assert(expected > 0)
  }

  test("drift aggregator matches the stateful forecaster semantics (X2)") {
    import graft.forecast.DriftAggregator
    val obs = Seq(
      ("ETH", DriftAggregator.Obs(1000L, 100.0)),
      ("ETH", DriftAggregator.Obs(2000L, 110.0)),
      ("ETH", DriftAggregator.Obs(3000L, 130.0)),
      ("SOL", DriftAggregator.Obs(1000L, 50.0))).toDF("symbol", "obs")
      .as[(String, DriftAggregator.Obs)]
    val out = obs.groupByKey(_._1).mapValues(_._2)
      .agg(DriftAggregator.agg.toColumn)
      .collect().toMap
    assert(out("ETH").forecast_next === 150.0) // 130 + (130-120... ) drift 20
    assert(out("ETH").n === 3L)
    assert(out("SOL").forecast_next === 50.0)  // single obs: zero drift
    assert(out("SOL").drift === 0.0)
  }
}

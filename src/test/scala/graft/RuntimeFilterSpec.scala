package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Runtime filter injection: when a shuffle join's small side carries a
  * selective predicate, Catalyst can inject a Bloom filter (or semi-join
  * IN-subquery) on the large side's scan — at 100 TB this prunes fact-side
  * rows before the shuffle, which is the difference between shuffling the
  * whole fact table and shuffling the matching slice. This spec pins the
  * capability on file-sourced inputs (runtime filters only apply to scans,
  * not in-memory LocalRelations).
  */
class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  test("selective dim filter injects a runtime filter on the fact scan") {
    val dir = Files.createTempDirectory("rtf").toString
    (0L until 200L).map(i => (i, s"g${i % 10}"))
      .toDF("dim_id", "grp").write.parquet(s"$dir/dim")
    (0L until 20000L).map(i => (i, i % 200L, i.toDouble))
      .toDF("fact_id", "dim_id", "v").write.parquet(s"$dir/fact")

    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val dim = spark.read.parquet(s"$dir/dim").filter($"grp" === "g3")
      val fact = spark.read.parquet(s"$dir/fact")
      val joined = fact.join(dim, Seq("dim_id"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.toLowerCase.contains("bloom") ||
        plan.contains("dynamicpruning") || plan.contains("in-subquery") ||
        plan.toLowerCase.contains("runtimefilter"),
        s"expected a runtime filter in:\n$plan")
      // and the join still returns the right rows
      assert(joined.count() === 2000L)
    } finally {
      // SparkSpec shares one session via getOrCreate — restore EVERY conf
      // this test touched or later suites' plan assertions become
      // suite-order dependent
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.enabled")
      spark.conf.unset(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      spark.conf.unset(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}

package graft

import org.apache.spark.sql.functions._

/** Bucketing = the co-located join strategy claimed in SCALE.md: two
  * tables bucketed + sorted on the join key join WITHOUT a shuffle
  * exchange on either side. This is the layout the engine would write for
  * repeatedly-joined 100 TB facts (e.g. embeddings bucketed by LSH bucket,
  * events by symbol).
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed+sorted tables join with no shuffle exchange") {
    val n = 1000
    val facts = (0 until n).map(i => (i.toLong % 50, i.toLong, i * 1.0))
      .toDF("k", "id", "v")
    val dims = (0L until 50L).map(k => (k, s"name_$k")).toDF("k", "name")

    spark.sql("DROP TABLE IF EXISTS b_facts")
    spark.sql("DROP TABLE IF EXISTS b_dims")
    facts.write.bucketBy(8, "k").sortBy("k").mode("overwrite")
      .saveAsTable("b_facts")
    dims.write.bucketBy(8, "k").sortBy("k").mode("overwrite")
      .saveAsTable("b_dims")
    try {
      // disable broadcast so the join must pick SMJ — the point is that
      // bucketing satisfies its distribution requirement without exchanges
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_facts").join(spark.table("b_dims"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange"),
        s"expected shuffle-free bucketed join, got:\n$plan")
      assert(joined.count() === n)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_facts")
      spark.sql("DROP TABLE IF EXISTS b_dims")
    }
  }
}

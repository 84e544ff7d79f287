package graft

import org.apache.spark.sql.functions._
import graft.functions.TDigestAgg
import graft.ops.StatsOps

class TDigestSpec extends SparkSpec {
  import spark.implicits._

  private def quantilesOf(df: org.apache.spark.sql.DataFrame,
                          partitions: Int): Map[String, (Double, Double, Double)] = {
    val qs = TDigestAgg.tdigestQuantiles(col("l_extendedprice"), 200.0,
      Seq(0.25, 0.5, 0.75))
    df.repartition(partitions)
      .groupBy(col("l_returnflag")).agg(qs.as("q")).collect()
      .map { r =>
        val a = r.getSeq[Double](1)
        r.getString(0) -> (a(0), a(1), a(2))
      }.toMap
  }

  test("t-digest quartiles track the exact quartiles within rank error") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
    val exact = StatsOps.summaryStats(li, "l_returnflag", "l_extendedprice")
      .collect().map { r =>
        r.getString(0) -> (r.getAs[Double]("q25"), r.getAs[Double]("median"),
          r.getAs[Double]("q75"), r.getAs[Double]("max_v") -
            r.getAs[Double]("min_v"))
      }.toMap
    val approx = quantilesOf(li, 8)
    assert(approx.keySet === exact.keySet)
    approx.foreach { case (k, (a25, a50, a75)) =>
      val (e25, e50, e75, range) = exact(k)
      // compression 200 -> rank error well under 1%; on a near-uniform
      // price distribution that is well under 2% of the value range
      val tol = range * 0.02
      assert(math.abs(a25 - e25) <= tol, s"$k q25: $a25 vs $e25")
      assert(math.abs(a50 - e50) <= tol, s"$k median: $a50 vs $e50")
      assert(math.abs(a75 - e75) <= tol, s"$k q75: $a75 vs $e75")
    }
  }

  test("t-digest is mergeable: 1-partition and 8-partition runs agree") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val one = quantilesOf(li, 1)
    val eight = quantilesOf(li, 8)
    // different partitionings exercise different merge trees; results are
    // not bit-identical (approximate sketch) but must stay within the
    // same rank-error envelope of each other
    val range = li.agg(max(col("l_extendedprice")) -
      min(col("l_extendedprice"))).collect().head.getDouble(0)
    one.foreach { case (k, (a, b, c)) =>
      val (x, y, z) = eight(k)
      assert(math.abs(a - x) <= range * 0.02, s"$k q25 merge drift")
      assert(math.abs(b - y) <= range * 0.02, s"$k median merge drift")
      assert(math.abs(c - z) <= range * 0.02, s"$k q75 merge drift")
    }
  }

  test("t-digest handles tiny and single-value groups") {
    val df = Seq(("a", 1.0), ("a", 1.0), ("b", 5.0)).toDF("k", "v")
    val qs = TDigestAgg.tdigestQuantiles(col("v"), 100.0, Seq(0.5))
    val out = df.groupBy(col("k")).agg(qs.as("q")).collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1).head).toMap
    assert(out("a") === 1.0)
    assert(out("b") === 5.0)
  }
}

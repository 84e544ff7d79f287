package graft

import graft.ops.StatsOps

/** Parity pin for the bucketed exact weighted quantile: the width_bucket
  * two-level scan must return exactly what the direct per-key cumsum
  * window returns — same threshold pick, same total weight — across
  * quantiles, key counts, bucket counts (including buckets >> distinct
  * values and buckets = 2), and the degenerate single-valued key.
  */
class WeightedQuantileSpec extends SparkSpec {
  import spark.implicits._

  // deterministic integer-weighted fixture: 3 keys x 200 values with
  // lumpy weights (hash-derived, no rand()) so bucket boundaries fall
  // mid-mass, multi-valued ties included via the mod-17 collapse
  private def fixture = {
    val rows = for {
      k <- Seq("a", "b", "c")
      i <- 1 to 200
    } yield {
      val v = ((i * 37 + k.hashCode.abs) % 17 * 100 + i % 7).toDouble
      val w = (math.abs((i * 2654435761L + k.hashCode) % 9) + 1).toDouble
      (k, v, w)
    }
    rows.toDF("k", "v", "w")
  }

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) ->
      (r.getDouble(1), r.getDouble(2))).toMap

  test("bucketed equals direct across quantiles and bucket counts") {
    val df = fixture
    for (q <- Seq(0.0, 0.1, 0.5, 0.9, 0.99); b <- Seq(2, 16, 4096)) {
      val direct = asMap(StatsOps.weightedQuantile(df, "k", "v", "w", q))
      val bucketed =
        asMap(StatsOps.weightedQuantileBucketed(df, "k", "v", "w", q, b))
      assert(bucketed === direct, s"q=$q buckets=$b")
    }
  }

  test("single-valued key and duplicate values collapse identically") {
    val df = Seq(("one", 5.0, 2.0), ("one", 5.0, 3.0),
      ("two", 1.0, 1.0), ("two", 9.0, 1.0)).toDF("k", "v", "w")
    val direct = asMap(StatsOps.weightedQuantile(df, "k", "v", "w", 0.5))
    val bucketed =
      asMap(StatsOps.weightedQuantileBucketed(df, "k", "v", "w", 0.5))
    assert(bucketed === direct)
    assert(bucketed("one") === ((5.0, 5.0)))
  }

  test("hand-computed thresholds hold on the bucketed path") {
    // values 1..4, weights 1,1,6,2 (cum 1,2,8,10): q=.5 -> 3, .9 -> 4
    val df = Seq(("g", 1.0, 1.0), ("g", 2.0, 1.0), ("g", 3.0, 6.0),
      ("g", 4.0, 2.0)).toDF("k", "v", "w")
    def wq(q: Double) =
      StatsOps.weightedQuantileBucketed(df, "k", "v", "w", q, 4)
        .collect().head.getDouble(1)
    assert(wq(0.5) === 3.0)
    assert(wq(0.9) === 4.0)
    assert(wq(0.1) === 1.0)
  }
}

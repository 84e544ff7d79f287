package graft

import java.sql.Timestamp
import graft.ops.TimeSeriesOps

/** EWMA fold semantics: init = first value, recursion order by time. */
class EwmaSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("ewmaLast matches the hand-rolled recursion") {
    val df = Seq(
      ("k", ts(1), 10.0), ("k", ts(2), 20.0), ("k", ts(3), 30.0))
      .toDF("key", "ts", "value")
    val got = TimeSeriesOps.ewmaLast(df, "key", "ts", "value", 0.5)
      .collect().head
    // s1=10, s2=0.5*20+0.5*10=15, s3=0.5*30+0.5*15=22.5
    assert(got.getLong(1) === 3L)
    assert(got.getDouble(2) === 22.5)
  }

  test("ewmaLast sorts by time regardless of input order") {
    val df = Seq(
      ("k", ts(3), 30.0), ("k", ts(1), 10.0), ("k", ts(2), 20.0))
      .toDF("key", "ts", "value")
    val got = TimeSeriesOps.ewmaLast(df, "key", "ts", "value", 0.5)
      .collect().head
    assert(got.getDouble(2) === 22.5)
  }

  test("single-point series returns the point itself") {
    val df = Seq(("a", ts(1), 7.0), ("b", ts(1), 1.0), ("b", ts(2), 3.0))
      .toDF("key", "ts", "value")
    val m = TimeSeriesOps.ewmaLast(df, "key", "ts", "value", 0.2)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(m("a") === 7.0)
    assert(math.abs(m("b") - (0.2 * 3.0 + 0.8 * 1.0)) < 1e-6)
  }

  test("alpha=1 tracks the last value, alpha→0 sticks near the first") {
    val df = Seq(("k", ts(1), 100.0), ("k", ts(2), 0.0), ("k", ts(3), 50.0))
      .toDF("key", "ts", "value")
    val track = TimeSeriesOps.ewmaLast(df, "key", "ts", "value", 1.0)
      .collect().head.getDouble(2)
    assert(track === 50.0)
    val sticky = TimeSeriesOps.ewmaLast(df, "key", "ts", "value", 0.01)
      .collect().head.getDouble(2)
    assert(math.abs(sticky - 100.0) < 2.0)
  }
}

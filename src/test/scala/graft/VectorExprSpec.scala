package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

class VectorExprSpec extends SparkSpec {
  import spark.implicits._

  private val hofDot = (a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =>
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("native dot_product matches the HOF formulation bit-for-bit") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(-0.5f, 0.25f, 0.0f), Array(2.0f, 8.0f, 1.0f)))
      .toDF("a", "b")
    val rows = df.select(
      VectorFunctions.dot_product($"a", $"b").as("native"),
      hofDot($"a", $"b").as("hof")).collect()
    rows.foreach { r =>
      assert(r.getDouble(0) === r.getDouble(1))
    }
    assert(rows.head.getDouble(0) === 32.0)
  }

  test("dot_product handles double arrays and null input") {
    val df = Seq(
      (Some(Array(1.0, 2.0)), Some(Array(3.0, 4.0))),
      (None: Option[Array[Double]], Some(Array(3.0, 4.0))))
      .toDF("a", "b")
    val rows = df.select(VectorFunctions.dot_product($"a", $"b").as("d"))
      .collect()
    assert(rows(0).getDouble(0) === 11.0)
    assert(rows(1).isNullAt(0))
  }

  test("dot_product is SQL-registrable") {
    VectorFunctions.register(spark)
    val out = spark.sql(
      "SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .collect().head.getDouble(0)
    assert(out === 11.0)
  }

  test("sq_dist_long matches the HOF fold exactly on random long arrays" +
      " (codegen and interpreted paths)") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 50).map { _ =>
      val n = 1 + rnd.nextInt(16)
      (Array.fill(n)(rnd.nextLong() % 10000000L),
        Array.fill(n)(rnd.nextLong() % 10000000L))
    }
    val df = rows.toDF("a", "b")
    val hof = aggregate(
      zip_with($"a", $"b", (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, v) => acc + v)
    val out = df.select(
      VectorFunctions.sq_dist_long($"a", $"b").as("native"),
      hof.as("hof")).collect()
    out.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("sq_dist_long: null array yields null, shorter array truncates") {
    val df = Seq(
      (Some(Array(1L, 2L, 3L)), Some(Array(1L, 1L))),
      (None: Option[Array[Long]], Some(Array(1L, 1L))))
      .toDF("a", "b")
    val out = df.select(
      VectorFunctions.sq_dist_long($"a", $"b").as("d")).collect()
    assert(out(0).getLong(0) === 1L) // (1-1)^2 + (2-1)^2, third truncated
    assert(out(1).isNullAt(0))
  }

  test("sq_dist_long rejects non-long-array input at analysis") {
    val df = Seq((Array(1.0, 2.0), Array(1.0, 2.0))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(VectorFunctions.sq_dist_long($"a", $"b")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("sq_dist_long") ||
      e.getMessage.toLowerCase.contains("datatype_mismatch"))
  }

  test("dot_product rejects non-numeric-array input at analysis") {
    val df = Seq(("x", "y")).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(VectorFunctions.dot_product($"a", $"b")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("dot_product") ||
      e.getMessage.toLowerCase.contains("data type"))
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.ops.RelationalOps

/** CDC merge (MERGE INTO semantics over a change log) unit coverage. */
class CdcMergeSpec extends SparkSpec {
  import spark.implicits._

  private def snap(df: org.apache.spark.sql.DataFrame): Set[(Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet

  test("applyChangeSet: latest change per key wins; D deletes, U updates, " +
       "unseen keys insert") {
    val base = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
    val changes = Seq(
      (1L, "U", 1L, 11.0), // superseded by seq 3
      (1L, "U", 3L, 12.0), // final: update
      (2L, "U", 2L, 21.0), // superseded by the delete
      (2L, "D", 5L, 0.0),  // final: delete
      (4L, "U", 4L, 40.0)) // insert of a key the base never had
      .toDF("k", "op", "seq", "v")
    val out = RelationalOps.applyChangeSet(base, changes, Seq("k"))
    assert(snap(out) === Set(1L -> 12.0, 3L -> 30.0, 4L -> 40.0))
  }

  test("applyChangeSet: delete-then-reinsert within one log resolves " +
       "by sequence, not op precedence") {
    val base = Seq((7L, 1.0)).toDF("k", "v")
    val changes = Seq((7L, "D", 1L, 0.0), (7L, "U", 2L, 9.0))
      .toDF("k", "op", "seq", "v")
    assert(snap(RelationalOps.applyChangeSet(base, changes, Seq("k")))
      === Set(7L -> 9.0))
  }

  test("applyChangeSet: empty log is identity; reapplying the same log " +
       "is idempotent") {
    val base = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")
    val empty = Seq.empty[(Long, String, Long, Double)]
      .toDF("k", "op", "seq", "v")
    assert(snap(RelationalOps.applyChangeSet(base, empty, Seq("k")))
      === Set(1L -> 10.0, 2L -> 20.0))
    val changes = Seq((1L, "U", 1L, 15.0), (2L, "D", 1L, 0.0))
      .toDF("k", "op", "seq", "v")
    val once = RelationalOps.applyChangeSet(base, changes, Seq("k"))
    val twice = RelationalOps.applyChangeSet(once, changes, Seq("k"))
    assert(snap(twice) === snap(once))
    assert(snap(once) === Set(1L -> 15.0))
  }

  test("mergeAggSnapshots: merging split snapshots equals the direct " +
       "full-scan aggregate") {
    val df = (1 to 200).map(i => (i % 7L, i.toDouble)).toDF("k", "v")
    def agg(d: org.apache.spark.sql.DataFrame) =
      d.groupBy($"k").agg(count(lit(1)).as("n"),
        round(sum($"v"), 2).as("s"), min($"v").as("mn"), max($"v").as("mx"))
    val merged = RelationalOps.mergeAggSnapshots(
      Seq(agg(df.filter($"v" <= 100)), agg(df.filter($"v" > 100))),
      Seq("k"), "n", Seq("s"), Seq("mn"), Seq("mx"))
    def rows(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSet
    assert(rows(merged) === rows(agg(df)))
  }

  test("streaming CDC apply: foreachBatch maintains a versioned snapshot " +
       "across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("cdc_stream").toString
    Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")
      .write.parquet(s"$dir/v0")
    val in = MemoryStream[(Long, String, Long, Double)]
    val q = in.toDF().toDF("k", "op", "seq", "v").writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val prev = spark.read.parquet(s"$dir/v$id")
        RelationalOps.applyChangeSet(prev, batch, Seq("k"))
          .write.parquet(s"$dir/v${id + 1}")
      }
      .start()
    try {
      in.addData((1L, "U", 1L, 11.0), (3L, "U", 1L, 30.0))
      q.processAllAvailable()
      in.addData((2L, "D", 2L, 0.0))
      q.processAllAvailable()
    } finally q.stop()
    assert(snap(spark.read.parquet(s"$dir/v2"))
      === Set(1L -> 11.0, 3L -> 30.0))
  }
}

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
}

package graft.ops

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Explicit block lifecycle for eager `localCheckpoint` frames.
  *
  * A locally-checkpointed Dataset pins its materialized blocks until the
  * driver GCs the reference AND the ContextCleaner gets around to them.
  * In an iterative operator that checkpoints every round, superseded
  * rounds accumulate as dead storage; in a long-lived JVM running
  * hundreds of queries the resulting memory pressure keeps the cleaner
  * churning concurrently with running tasks — and a cleanup racing a
  * still-running task can kill the whole application (a vanished
  * broadcast/RDD block throws inside a task-completion listener, which
  * Spark's uncaught-exception handler treats as fatal). Freeing
  * superseded checkpoints promptly and synchronously keeps storage flat
  * and the cleaner idle.
  */
private[graft] object CheckpointLifecycle {

  /** The backing RDD of a `localCheckpoint`-ed frame (None if the plan
    * is not checkpoint-backed). */
  def backingRdd(df: DataFrame): Option[RDD[_]] =
    df.queryExecution.analyzed.collectFirst { case lr: LogicalRDD => lr.rdd }

  /** Synchronously free a superseded checkpoint's blocks. Only call once
    * nothing will read `df` again — a locally-checkpointed RDD cannot be
    * recomputed after unpersist. */
  def release(df: DataFrame): Unit =
    backingRdd(df).foreach(_.unpersist(blocking = true))
}

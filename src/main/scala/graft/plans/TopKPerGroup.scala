package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression,
  RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Whole-operator extension (SURVEY.md §7 preference (c)): top-k rows per
  * group as a first-class plan node.
  *
  * Spark's only declarative spelling of per-group top-k is
  * `row_number() OVER (PARTITION BY g ORDER BY o) <= k`, which plans as a
  * full shuffle of EVERY row followed by a full sort of every group, just
  * to throw away all but k rows — at 100 TB the sort+shuffle of the
  * discarded 99.99% dominates the job. This operator instead keeps a
  * bounded k-row heap per group on the map side, shuffles only
  * `partitions x groups x k` candidate rows, and re-heaps per group after
  * the shuffle: the same partial-aggregate shape Spark uses for
  * hash aggregates, applied to top-k (memory per task is
  * O(groups-in-partition x k), independent of input rows).
  *
  * The reference's leaderboard/top-n queries (SURVEY.md §2.7 O1/O3) get
  * identical results from either spelling; `TopKPlanSpec` pins parity and
  * the plan shape (no global window sort, two heap stages around one
  * shuffle).
  */
case class TopKPerGroup(
    groupExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(
      newChild: LogicalPlan): TopKPerGroup = copy(child = newChild)
}

/** Physical top-k-per-group: one bounded-heap pass. Runs twice — a
  * `partial` instance on raw map partitions (no distribution requirement)
  * and a final instance that asks Catalyst for
  * `ClusteredDistribution(groupExprs)`, so EnsureRequirements inserts
  * exactly one shuffle carrying only the partial survivors.
  */
case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(groupExprs))

  protected override def doExecute(): RDD[InternalRow] = {
    val kk = k
    val groupE = groupExprs
    val ordE = ordering
    val childOutput = child.output
    child.execute().mapPartitions({ iter =>
      val groupProj = UnsafeProjection.create(groupE, childOutput)
      // RowOrdering: "row a sorts before row b" => keep the k smallest
      // under the requested SortOrder (which already encodes asc/desc)
      val ord = RowOrdering.create(ordE, childOutput)
      // max-heap per group: head = worst survivor, evicted on better rows
      val heaps =
        mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = groupProj(row)
        heaps.get(key) match {
          case Some(heap) =>
            if (heap.size < kk) heap.enqueue(row.copy())
            else if (ord.compare(row, heap.head) < 0) {
              heap.dequeue(); heap.enqueue(row.copy())
            }
          case None =>
            val heap = mutable.PriorityQueue.empty[InternalRow](ord)
            heap.enqueue(row.copy())
            heaps.put(key.copy(), heap)
        }
      }
      heaps.valuesIterator.flatMap(_.dequeueAll.reverseIterator)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(
      newChild: SparkPlan): TopKPerGroupExec = copy(child = newChild)
}

/** Plans [[TopKPerGroup]] as partial-heap -> (shuffle) -> final-heap.
  * Register via `spark.experimental.extraStrategies` (done lazily by
  * `TopKOps`) or `SparkSessionExtensions.injectPlannerStrategy`
  * (`GraftExtensions`).
  */
object TopKPerGroupStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child) =>
      TopKPerGroupExec(g, o, k, partial = false,
        TopKPerGroupExec(g, o, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

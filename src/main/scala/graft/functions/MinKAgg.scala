package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded smallest-k MULTISET aggregate: keeps the `k` smallest input
  * strings per group (duplicates included — the same rows `row_number()
  * OVER (ORDER BY x) <= k` keeps), emitted ascending. Nulls are skipped,
  * like `collect_list`.
  *
  * This is the one-scan capped form of the flagship family's
  * non-combining texts column ([[graft.ops.MetricOps
  * .windowedMetricsWithTextsCapped]]): unlike an unbounded
  * `collect_list` later sliced — which buffers and shuffles EVERY
  * element — the aggregation buffer itself is capped at `k` elements,
  * so map-side partials carry at most k values per (group, partition)
  * through the shuffle and state never grows with group size. Unlike
  * the two-leg TopKPerGroup + join formulation it replaces, it rides
  * the SAME single aggregation as the combining metrics — one scan of
  * the input, no second aggregate, no join back.
  *
  * Update is O(1) for the common saturated case (incoming value not
  * below the current k-th smallest) and O(k log k) otherwise with tiny
  * k; merge is O(k log k). Buffer is a plain sorted Seq — an
  * object-hash aggregation buffer like `collect_list`'s, so adding it
  * beside declarative metrics changes nothing about the plan shape the
  * uncapped twin already has.
  */
class MinKAgg(k: Int) extends Aggregator[String, Seq[String], Seq[String]] {
  require(k >= 1, s"k=$k")

  override def zero: Seq[String] = Nil

  override def reduce(b: Seq[String], x: String): Seq[String] =
    if (x == null) b
    else if (b.length >= k && b.last <= x) b
    else ((x +: b).sorted).take(k)

  override def merge(a: Seq[String], b: Seq[String]): Seq[String] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else (a ++ b).sorted.take(k)

  override def finish(b: Seq[String]): Seq[String] = b

  override def bufferEncoder: Encoder[Seq[String]] =
    ExpressionEncoder[Seq[String]]()
  override def outputEncoder: Encoder[Seq[String]] =
    ExpressionEncoder[Seq[String]]()
}

object MinKAgg {
  /** Column form: ascending array of the k lexicographically smallest
    * non-null values of `c` (duplicates kept). */
  def minK(c: Column, k: Int): Column = udaf(new MinKAgg(k)).apply(c)
}

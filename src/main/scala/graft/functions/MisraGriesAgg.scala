package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable Misra-Gries buffer: `capacity` counter slots, parallel
  * key/count arrays, count 0 marking a free slot. Mutated in place
  * between serialization boundaries, same discipline as [[TDigestBuf]].
  */
final case class MgBuf(keys: Array[String], counts: Array[Long])

/** Mergeable Misra-Gries heavy-hitters sketch (the "mergeable summaries"
  * formulation: Agarwal et al., PODS '12) as a typed Spark [[Aggregator]]
  * — the declared 100 TB path for the A7 value_counts/top-k family when
  * the key cardinality is too large for an exact count-shuffle: the
  * buffer is O(capacity) regardless of group size or cardinality, partial
  * aggregation combines map-side, and each reported count is a LOWER
  * bound no more than n/(capacity+1) below the true frequency — so every
  * key with true share above 1/(capacity+1) is guaranteed present.
  *
  * Stream step: known keys increment; unknown keys take a free slot, or
  * (buffer full) decrement every counter by one — charging one occurrence
  * of each tracked key against the arriving untracked one. Merge: sum
  * counters by key, then subtract the (capacity+1)-th largest count from
  * all and keep positives (at most `capacity` survive); the subtraction
  * preserves the lower-bound + error-budget invariants under arbitrary
  * merge trees, which is what makes the sketch safe for Spark's
  * partial/final aggregation plan.
  *
  * When `capacity` is at least the group's true distinct-key count, no
  * decrement or cut ever fires and the sketch is EXACT — the catalog
  * entry runs in that regime (hash-checkable against a DuckDB count
  * oracle); the approximate regime's guarantees are pinned in
  * MisraGriesSpec.
  *
  * Output: top `k` surviving entries as (key, count) pairs, ordered by
  * (count desc, key asc).
  */
class MisraGriesAgg(capacity: Int, k: Int)
    extends Aggregator[String, MgBuf, Seq[(String, Long)]] {
  require(capacity >= k && k >= 1, s"capacity=$capacity k=$k")

  override def zero: MgBuf =
    MgBuf(new Array[String](capacity), new Array[Long](capacity))

  override def reduce(b: MgBuf, x: String): MgBuf = {
    if (x == null) return b
    var i = 0
    var free = -1
    while (i < capacity) {
      if (b.counts(i) > 0 && b.keys(i) == x) {
        b.counts(i) += 1
        return b
      }
      if (free < 0 && b.counts(i) == 0L) free = i
      i += 1
    }
    if (free >= 0) {
      b.keys(free) = x
      b.counts(free) = 1L
    } else {
      var j = 0
      while (j < capacity) { b.counts(j) -= 1; j += 1 }
    }
    b
  }

  override def merge(a: MgBuf, b: MgBuf): MgBuf = {
    val m = scala.collection.mutable.HashMap.empty[String, Long]
    def fold(x: MgBuf): Unit = {
      var i = 0
      while (i < x.keys.length) {
        if (x.counts(i) > 0)
          m.update(x.keys(i), m.getOrElse(x.keys(i), 0L) + x.counts(i))
        i += 1
      }
    }
    fold(a); fold(b)
    val entries =
      if (m.size <= capacity) m.toSeq
      else {
        val sorted = m.toSeq.sortBy { case (key, c) => (-c, key) }
        val cut = sorted(capacity)._2
        sorted.take(capacity)
          .map { case (key, c) => (key, c - cut) }
          .filter(_._2 > 0)
      }
    val keys = new Array[String](capacity)
    val counts = new Array[Long](capacity)
    entries.zipWithIndex.foreach { case ((key, c), i) =>
      keys(i) = key; counts(i) = c
    }
    MgBuf(keys, counts)
  }

  override def finish(b: MgBuf): Seq[(String, Long)] =
    b.keys.zip(b.counts).filter(_._2 > 0)
      .sortBy { case (key, c) => (-c, key) }
      .take(k).toSeq

  override def bufferEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder[Seq[(String, Long)]]()
}

object MisraGriesAgg {
  /** Column form: top-k (key, lower-bound count) pairs of `keyCol`. */
  def heavyHitters(keyCol: Column, capacity: Int, k: Int): Column =
    udaf(new MisraGriesAgg(capacity, k)).apply(keyCol)
}

package graft.functions

import java.io.{ByteArrayInputStream, DataInputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate
  .TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Bounded smallest-k MULTISET buffer: a size-`k` MAX-heap of
  * [[UTF8String]]s — the root is the LARGEST survivor, so admission is
  * one byte-compare against the root once saturated. Duplicates are
  * kept (the same rows `row_number() OVER (ORDER BY x) <= k` keeps).
  *
  * Mutated in place between serialization boundaries, same discipline
  * as the other object-buffer aggregates here ([[TDigestBuf]],
  * [[MgBuf]]).
  */
final class MinKHeap(val k: Int) {
  val arr = new Array[UTF8String](k)
  var size = 0

  /** Admit `x` if the buffer isn't saturated or `x` beats the current
    * k-th smallest. `x` MUST already be owned by this buffer (callers
    * clone row-backed memory before inserting). */
  def insert(x: UTF8String): Unit = {
    if (size < k) {
      var i = size
      arr(i) = x
      size += 1
      // sift up
      while (i > 0 && arr((i - 1) / 2).binaryCompare(arr(i)) < 0) {
        val p = (i - 1) / 2
        val t = arr(p); arr(p) = arr(i); arr(i) = t
        i = p
      }
    } else if (x.binaryCompare(arr(0)) < 0) {
      arr(0) = x
      // sift down
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1
        val r = l + 1
        var m = i
        if (l < size && arr(l).binaryCompare(arr(m)) > 0) m = l
        if (r < size && arr(r).binaryCompare(arr(m)) > 0) m = r
        if (m == i) done = true
        else {
          val t = arr(m); arr(m) = arr(i); arr(i) = t
          i = m
        }
      }
    }
  }

  /** Ascending copy of the survivors (the heap itself stays intact). */
  def sortedAscending: Array[UTF8String] = {
    val out = java.util.Arrays.copyOf(arr, size)
    java.util.Arrays.sort(out,
      (a: UTF8String, b: UTF8String) => a.binaryCompare(b))
    out
  }
}

/** Bounded smallest-k multiset aggregate as a native
  * [[TypedImperativeAggregate]] — the one-scan capped form behind the
  * `*_capped` catalog twins ([[graft.ops.MetricOps
  * .windowedMetricsWithTextsCapped]], `a5_collect_series_capped`,
  * `a14_group_concat_capped`): unlike an unbounded `collect_list`
  * later sliced — which buffers and shuffles EVERY element — the
  * aggregation buffer itself is capped at `k` elements, so map-side
  * partials carry at most k values per (group, partition) through the
  * shuffle and state never grows with group size. It rides the SAME
  * single aggregation as any sibling declarative metrics — one scan of
  * the input, no second aggregate, no join back.
  *
  * Native rather than a typed `Aggregator` udaf (the r14-early form)
  * because the udaf's per-row encoder round-trip decodes every
  * [[UTF8String]] into a heap `String` before comparing — measured 2×
  * on 500-char document text (`a14_group_concat_capped` 1.04 s vs the
  * uncapped 0.51 at sf0.1). Here update is one branch + one
  * byte-compare against the heap root once saturated, and only
  * ADMITTED values are cloned out of the scan's reused row memory —
  * O(k) live state, zero per-row allocation in the saturated steady
  * state. Plan shape is unchanged: an object-buffer aggregate in the
  * same ObjectHashAggregate the udaf (and `collect_list`) already
  * forced.
  *
  * Ordering is [[UTF8String.binaryCompare]] (UTF-8 byte order) — the
  * SAME order Spark's own `array_sort`/`ORDER BY` use for StringType
  * under the default binary collation, and the same order DuckDB's
  * default collation gives the oracle twins; the old udaf compared
  * java Strings (UTF-16 code units), which agrees on ASCII but
  * diverges on supplementary-plane text — the native form removes
  * that latent divergence. Nulls are skipped, like `collect_list`;
  * an empty group yields an empty array.
  */
case class MinK(child: Expression, k: Int,
                mutableAggBufferOffset: Int = 0,
                inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MinKHeap] with UnaryLike[Expression] {
  require(k >= 1, s"k=$k")

  // analysis-time contract: a non-string child fails with a clean
  // AnalysisException instead of a mid-scan executor ClassCastException
  // (same pattern as TextHashExpr — ExpectsInputTypes is unusable from
  // an extension package, its Seq[AbstractDataType] type is
  // private[sql]). Collated strings whose ORDER diverges from binary
  // compare (e.g. UTF8_LCASE) are rejected too: this aggregate orders
  // by UTF8String.binaryCompare, and silently ranking a collated
  // column by raw bytes would keep the wrong k elements.
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      // equality with the companion instance = the default UTF8_BINARY
      // collation, the one whose sort order IS binaryCompare (the
      // finer-grained supportsBinaryOrdering predicate is private[sql])
      case st: StringType if st == StringType =>
        TypeCheckResult.TypeCheckSuccess
      case st: StringType => TypeCheckResult.TypeCheckFailure(
        s"$prettyName orders by binary compare; non-binary-collated " +
          s"input ${st.sql} would keep the wrong k elements")
      case dt => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a string column, got ${dt.sql}")
    }

  override def createAggregationBuffer(): MinKHeap = new MinKHeap(k)

  override def update(b: MinKHeap, input: InternalRow): MinKHeap = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      // admission test BEFORE cloning: saturated groups reject almost
      // every row with one byte-compare and no allocation
      if (b.size < b.k || s.binaryCompare(b.arr(0)) < 0)
        b.insert(s.clone())
    }
    b
  }

  override def merge(b: MinKHeap, o: MinKHeap): MinKHeap = {
    var i = 0
    while (i < o.size) {
      // already-serialized values own their bytes; no clone needed
      b.insert(o.arr(i))
      i += 1
    }
    b
  }

  override def eval(b: MinKHeap): Any =
    new GenericArrayData(b.sortedAscending.asInstanceOf[Array[Any]])

  override def serialize(b: MinKHeap): Array[Byte] = {
    // exact size is computable up front (4-byte count + per-element
    // 4-byte length + bytes), so write straight into the result array —
    // no growing-stream re-copies, no toByteArray second copy, and k
    // travels with the expression, not the payload
    var total = 4
    var i = 0
    while (i < b.size) { total += 4 + b.arr(i).numBytes(); i += 1 }
    val out = new Array[Byte](total)
    def putInt(pos: Int, v: Int): Unit = {
      out(pos) = (v >>> 24).toByte
      out(pos + 1) = (v >>> 16).toByte
      out(pos + 2) = (v >>> 8).toByte
      out(pos + 3) = v.toByte
    }
    putInt(0, b.size)
    var off = 4
    i = 0
    while (i < b.size) {
      val bytes = b.arr(i).getBytes
      putInt(off, bytes.length)
      System.arraycopy(bytes, 0, out, off + 4, bytes.length)
      off += 4 + bytes.length
      i += 1
    }
    out
  }

  override def deserialize(bytes: Array[Byte]): MinKHeap = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val h = new MinKHeap(k)
    val n = in.readInt()
    var i = 0
    // serialized order IS heap-array order, so restoring positionally
    // preserves the heap invariant without re-sifting
    while (i < n) {
      val len = in.readInt()
      val arr = new Array[Byte](len)
      in.readFully(arr)
      h.arr(i) = UTF8String.fromBytes(arr)
      i += 1
    }
    h.size = n
    h
  }

  override def dataType: DataType = ArrayType(StringType,
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "min_k"

  override def withNewMutableAggBufferOffset(offset: Int): MinK =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MinK =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): MinK =
    copy(child = newChild)
}

object MinKAgg {
  /** Column form: ascending array of the k smallest non-null values of
    * `c` in UTF-8 byte order (duplicates kept). */
  def minK(c: Column, k: Int): Column =
    Bridge.column(MinK(Bridge.expression(c), k).toAggregateExpression())
}

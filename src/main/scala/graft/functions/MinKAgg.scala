package graft.functions

import java.io.{ByteArrayInputStream, DataInputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.aggregate
  .TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType,
  IntegerType, LongType, StringType, StructType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/** Aggregation buffers for the bounded smallest-k aggregates below —
  * all size-`k` MAX-heaps (the root is the LARGEST survivor, so
  * admission once saturated is one compare against the root), mutated
  * in place between serialization boundaries, same discipline as the
  * other object-buffer aggregates here ([[TDigestBuf]], [[MgBuf]]). */
sealed trait MinKBuf

/** Bounded smallest-k MULTISET buffer over [[UTF8String]]s, byte-order
  * compare. Duplicates are kept (the same rows
  * `row_number() OVER (ORDER BY x) <= k` keeps). */
final class MinKHeap(val k: Int) extends MinKBuf {
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

/** Bounded smallest-k MULTISET buffer over primitive longs — the typed
  * sibling of [[MinKHeap]]: signed ordinal compare, zero boxing, zero
  * per-row allocation even on admission. */
final class MinKLongHeap(val k: Int) extends MinKBuf {
  val arr = new Array[Long](k)
  var size = 0

  def insert(x: Long): Unit = {
    if (size < k) {
      var i = size
      arr(i) = x
      size += 1
      while (i > 0 && arr((i - 1) / 2) < arr(i)) {
        val p = (i - 1) / 2
        val t = arr(p); arr(p) = arr(i); arr(i) = t
        i = p
      }
    } else if (x < arr(0)) {
      arr(0) = x
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1
        val r = l + 1
        var m = i
        if (l < size && arr(l) > arr(m)) m = l
        if (r < size && arr(r) > arr(m)) m = r
        if (m == i) done = true
        else {
          val t = arr(m); arr(m) = arr(i); arr(i) = t
          i = m
        }
      }
    }
  }

  def sortedAscending: Array[Long] = {
    val out = java.util.Arrays.copyOf(arr, size)
    java.util.Arrays.sort(out)
    out
  }
}

/** Bounded smallest-k-BY-KEY buffer: parallel (long key, payload)
  * arrays ordered lexicographically on (key, payload-under-`cmp`) —
  * the payload tie-break makes the survivor set deterministic under
  * duplicate keys, matching a `row_number() OVER (ORDER BY key,
  * payload) <= k` oracle exactly. Payloads are opaque `AnyRef`s ordered
  * by the caller-supplied comparator (UTF8String byte order for string
  * payloads; field-wise [[InternalRow]] order for struct payloads), so
  * the keys stay a primitive array either way. */
final class MinKByHeap(val k: Int,
                       cmp: java.util.Comparator[AnyRef]) extends MinKBuf {
  val keys = new Array[Long](k)
  val vals = new Array[AnyRef](k)
  var size = 0

  @inline private def gt(i: Int, j: Int): Boolean =
    keys(i) > keys(j) ||
      (keys(i) == keys(j) && cmp.compare(vals(i), vals(j)) > 0)

  /** True when (`key`, `v`) orders strictly before the current root
    * (the largest survivor) — the saturated-path admission test,
    * callable BEFORE cloning `v` out of reused row memory. */
  def beatsRoot(key: Long, v: AnyRef): Boolean =
    key < keys(0) ||
      (key == keys(0) && cmp.compare(v, vals(0)) < 0)

  /** `v` MUST already be owned by this buffer (callers clone/copy
    * row-backed memory before inserting). */
  def insert(key: Long, v: AnyRef): Unit = {
    if (size < k) {
      var i = size
      keys(i) = key; vals(i) = v
      size += 1
      while (i > 0 && gt(i, (i - 1) / 2)) {
        val p = (i - 1) / 2
        val tk = keys(p); keys(p) = keys(i); keys(i) = tk
        val tv = vals(p); vals(p) = vals(i); vals(i) = tv
        i = p
      }
    } else if (beatsRoot(key, v)) {
      keys(0) = key; vals(0) = v
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1
        val r = l + 1
        var m = i
        if (l < size && gt(l, m)) m = l
        if (r < size && gt(r, m)) m = r
        if (m == i) done = true
        else {
          val tk = keys(m); keys(m) = keys(i); keys(i) = tk
          val tv = vals(m); vals(m) = vals(i); vals(i) = tv
          i = m
        }
      }
    }
  }

  /** Payloads in ascending (key, payload) order (heap stays intact). */
  def sortedPayloads: Array[AnyRef] = {
    val idx = Array.range(0, size)
    val boxed = idx.map(Integer.valueOf)
    java.util.Arrays.sort(boxed, (a: Integer, b: Integer) => {
      val (i, j) = (a.intValue(), b.intValue())
      if (keys(i) != keys(j)) java.lang.Long.compare(keys(i), keys(j))
      else cmp.compare(vals(i), vals(j))
    })
    boxed.map(i => vals(i.intValue()))
  }
}

/** Bounded smallest-k multiset aggregate as a native
  * [[TypedImperativeAggregate]] — the one-scan capped form behind the
  * `*_capped` catalog twins ([[graft.ops.MetricOps
  * .windowedMetricsWithTextsCapped]], `a14_group_concat_capped`):
  * unlike an unbounded `collect_list` later sliced — which buffers and
  * shuffles EVERY element — the aggregation buffer itself is capped at
  * `k` elements, so map-side partials carry at most k values per
  * (group, partition) through the shuffle and state never grows with
  * group size. It rides the SAME single aggregation as any sibling
  * declarative metrics — one scan of the input, no second aggregate,
  * no join back.
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
  * Typed: a StringType child orders by [[UTF8String.binaryCompare]]
  * (UTF-8 byte order) — the SAME order Spark's own
  * `array_sort`/`ORDER BY` use for StringType under the default binary
  * collation, and the same order DuckDB's default collation gives the
  * oracle twins; a LongType child orders by signed ordinal compare on
  * a primitive-long heap (no string detour, no boxing) and yields
  * `array<bigint>`. Other types are rejected at analysis time. Nulls
  * are skipped, like `collect_list`; an empty group yields an empty
  * array.
  */
case class MinK(child: Expression, k: Int,
                mutableAggBufferOffset: Int = 0,
                inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MinKBuf] with UnaryLike[Expression] {
  require(k >= 1, s"k=$k")

  // analysis-time contract: an unsupported child fails with a clean
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
      case LongType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a string or bigint column, got ${dt.sql}")
    }

  private def isLong = child.dataType == LongType

  override def createAggregationBuffer(): MinKBuf =
    if (isLong) new MinKLongHeap(k) else new MinKHeap(k)

  override def update(buf: MinKBuf, input: InternalRow): MinKBuf = {
    val v = child.eval(input)
    if (v != null) buf match {
      case b: MinKLongHeap => b.insert(v.asInstanceOf[Long])
      case b: MinKHeap =>
        val s = v.asInstanceOf[UTF8String]
        // admission test BEFORE cloning: saturated groups reject almost
        // every row with one byte-compare and no allocation
        if (b.size < b.k || s.binaryCompare(b.arr(0)) < 0)
          b.insert(s.clone())
      case _ => throw new IllegalStateException("MinK buffer mismatch")
    }
    buf
  }

  override def merge(buf: MinKBuf, other: MinKBuf): MinKBuf = {
    (buf, other) match {
      case (b: MinKLongHeap, o: MinKLongHeap) =>
        var i = 0
        while (i < o.size) { b.insert(o.arr(i)); i += 1 }
      case (b: MinKHeap, o: MinKHeap) =>
        var i = 0
        while (i < o.size) {
          // already-serialized values own their bytes; no clone needed
          b.insert(o.arr(i))
          i += 1
        }
      case _ => throw new IllegalStateException("MinK buffer mismatch")
    }
    buf
  }

  override def eval(buf: MinKBuf): Any = buf match {
    case b: MinKLongHeap =>
      UnsafeArrayData.fromPrimitiveArray(b.sortedAscending)
    case b: MinKHeap =>
      new GenericArrayData(b.sortedAscending.asInstanceOf[Array[Any]])
    case _ => throw new IllegalStateException("MinK buffer mismatch")
  }

  override def serialize(buf: MinKBuf): Array[Byte] = buf match {
    case b: MinKLongHeap =>
      // 4-byte count + 8 bytes per element, heap-array order
      val out = new Array[Byte](4 + 8 * b.size)
      MinKSerde.putInt(out, 0, b.size)
      var i = 0
      while (i < b.size) {
        MinKSerde.putLong(out, 4 + 8 * i, b.arr(i))
        i += 1
      }
      out
    case b: MinKHeap =>
      // exact size is computable up front (4-byte count + per-element
      // 4-byte length + bytes), so write straight into the result
      // array — no growing-stream re-copies, no toByteArray second
      // copy, and k travels with the expression, not the payload
      var total = 4
      var i = 0
      while (i < b.size) { total += 4 + b.arr(i).numBytes(); i += 1 }
      val out = new Array[Byte](total)
      MinKSerde.putInt(out, 0, b.size)
      var off = 4
      i = 0
      while (i < b.size) {
        val bytes = b.arr(i).getBytes
        MinKSerde.putInt(out, off, bytes.length)
        System.arraycopy(bytes, 0, out, off + 4, bytes.length)
        off += 4 + bytes.length
        i += 1
      }
      out
    case _ => throw new IllegalStateException("MinK buffer mismatch")
  }

  override def deserialize(bytes: Array[Byte]): MinKBuf = {
    // serialized order IS heap-array order, so restoring positionally
    // preserves the heap invariant without re-sifting
    if (isLong) {
      val n = MinKSerde.getInt(bytes, 0)
      val h = new MinKLongHeap(k)
      var i = 0
      while (i < n) {
        h.arr(i) = MinKSerde.getLong(bytes, 4 + 8 * i)
        i += 1
      }
      h.size = n
      h
    } else {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val h = new MinKHeap(k)
      val n = in.readInt()
      var i = 0
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
  }

  override def dataType: DataType =
    ArrayType(if (isLong) LongType else StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "min_k"

  override def withNewMutableAggBufferOffset(offset: Int): MinK =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MinK =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): MinK =
    copy(child = newChild)
}

/** Bounded smallest-k-BY-KEY aggregate: keeps the `k` payloads whose
  * (bigint key, payload) pair orders smallest — i.e. the rows
  * `row_number() OVER (ORDER BY key, payload) <= k` keeps — and
  * returns them in ascending (key, payload) order. The keyed sibling
  * of [[MinK]] for when the RANKING column differs from the OUTPUT
  * column: `a5_collect_series_capped` ranks by epoch-millis (a true
  * chronological head, no lexicographic zero-pad encoding of time into
  * the payload) while emitting the human-readable "epoch:value" point,
  * and `a5_collect_series_capped_typed` emits the TYPED
  * `array<struct<...>>` point the consumer can use without re-parsing.
  * Same bounded-buffer contract: O(k) state, map-side partials ship
  * ≤ k (key, payload) pairs per (group, partition), one payload-compare
  * + one long-compare admission once saturated. Rows where either child
  * is null are skipped (`collect_list` semantics); an empty group
  * yields an empty array.
  *
  * Payload types: a binary-collated string (UTF-8 byte-order
  * tie-break) or a STRUCT whose fields are each bigint / int / double /
  * timestamp / binary-collated string — struct payloads tie-break
  * FIELD-WISE in declaration order, nulls FIRST per field: the
  * lexicographic struct order `ORDER BY payload` gives in SPARK (ASC
  * defaults to NULLS FIRST). DuckDB defaults to NULLS LAST for ASC, so
  * a DuckDB oracle over a struct payload with nullable fields must
  * spell `NULLS FIRST` per field (or filter null-fielded rows out, as
  * the shipped a5 consumers do via the null-key / null-payload skip) —
  * otherwise the survivor sets diverge at the admission boundary.
  * Struct partials
  * travel the shuffle as UnsafeRow bytes. (Doubles tie-break by IEEE
  * total order — `java.lang.Double.compare` — which puts -0.0 before
  * 0.0 where SQL comparison calls them equal; only the admission
  * boundary of a group holding both could notice.)
  */
case class MinKBy(left: Expression, right: Expression, k: Int,
                  mutableAggBufferOffset: Int = 0,
                  inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MinKBuf] with BinaryLike[Expression] {
  require(k >= 1, s"k=$k")

  private def key = left
  private def payload = right

  /** Struct-payload field types supported by [[fieldCmp]] + the
    * UnsafeRow serde; anything else is rejected at analysis time. */
  private def fieldOk(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | DoubleType | TimestampType => true
    case st: StringType => st == StringType
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (key.dataType, payload.dataType) match {
      case (LongType, st: StringType) if st == StringType =>
        TypeCheckResult.TypeCheckSuccess
      case (LongType, st: StringType) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName tie-breaks by binary compare; non-binary-collated " +
          s"payload ${st.sql} would keep the wrong k elements")
      case (LongType, st: StructType) =>
        st.fields.find(f => !fieldOk(f.dataType)) match {
          case None => TypeCheckResult.TypeCheckSuccess
          case Some(f) => TypeCheckResult.TypeCheckFailure(
            s"$prettyName struct payloads tie-break field-wise; field " +
              s"${f.name}: ${f.dataType.sql} has no supported order " +
              "(use bigint/int/double/timestamp/binary-collated string)")
        }
      case (kt, vt) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (bigint key, string or struct payload), " +
          s"got (${kt.sql}, ${vt.sql})")
    }

  private def isStruct = payload.dataType.isInstanceOf[StructType]
  @transient private lazy val structType =
    payload.dataType.asInstanceOf[StructType]

  /** Null-safe (nulls-first) comparator for struct field `i`. */
  private def fieldCmp(dt: DataType, i: Int)
      : (InternalRow, InternalRow) => Int = {
    val base: (InternalRow, InternalRow) => Int = dt match {
      case LongType | TimestampType =>
        (a, b) => java.lang.Long.compare(a.getLong(i), b.getLong(i))
      case IntegerType =>
        (a, b) => Integer.compare(a.getInt(i), b.getInt(i))
      case DoubleType =>
        (a, b) => java.lang.Double.compare(a.getDouble(i), b.getDouble(i))
      case _ =>
        (a, b) => a.getUTF8String(i).binaryCompare(b.getUTF8String(i))
    }
    (a, b) => {
      val an = a.isNullAt(i)
      val bn = b.isNullAt(i)
      if (an && bn) 0 else if (an) -1 else if (bn) 1 else base(a, b)
    }
  }

  @transient private lazy val payloadCmp: java.util.Comparator[AnyRef] =
    if (!isStruct)
      (x: AnyRef, y: AnyRef) =>
        x.asInstanceOf[UTF8String]
          .binaryCompare(y.asInstanceOf[UTF8String])
    else {
      val cmps = structType.fields.zipWithIndex
        .map { case (f, i) => fieldCmp(f.dataType, i) }
      (x: AnyRef, y: AnyRef) => {
        val a = x.asInstanceOf[InternalRow]
        val b = y.asInstanceOf[InternalRow]
        var c = 0
        var i = 0
        while (c == 0 && i < cmps.length) { c = cmps(i)(a, b); i += 1 }
        c
      }
    }

  /** Struct serde projection (Generic rows from the scan -> UnsafeRow
    * bytes for the shuffle). The projection reuses its output buffer,
    * so serialize copies each result before the next apply. */
  @transient private lazy val toUnsafe =
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection
      .create(structType.fields.map(_.dataType))

  override def createAggregationBuffer(): MinKBuf =
    new MinKByHeap(k, payloadCmp)

  override def update(buf: MinKBuf, input: InternalRow): MinKBuf = {
    val b = buf.asInstanceOf[MinKByHeap]
    val kv = key.eval(input)
    if (kv != null) {
      val pv = payload.eval(input)
      if (pv != null) {
        val kl = kv.asInstanceOf[Long]
        // admission test BEFORE cloning/copying the payload out of the
        // scan's reused row memory
        if (isStruct) {
          val r = pv.asInstanceOf[InternalRow]
          if (b.size < b.k || b.beatsRoot(kl, r)) b.insert(kl, r.copy())
        } else {
          val s = pv.asInstanceOf[UTF8String]
          if (b.size < b.k || b.beatsRoot(kl, s)) b.insert(kl, s.clone())
        }
      }
    }
    buf
  }

  override def merge(buf: MinKBuf, other: MinKBuf): MinKBuf = {
    val b = buf.asInstanceOf[MinKByHeap]
    val o = other.asInstanceOf[MinKByHeap]
    var i = 0
    while (i < o.size) {
      // already-deserialized values own their bytes; no clone needed
      b.insert(o.keys(i), o.vals(i))
      i += 1
    }
    buf
  }

  override def eval(buf: MinKBuf): Any = {
    val b = buf.asInstanceOf[MinKByHeap]
    new GenericArrayData(b.sortedPayloads.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: MinKBuf): Array[Byte] = {
    val b = buf.asInstanceOf[MinKByHeap]
    // per element: 8-byte key + 4-byte length + payload bytes (UTF-8
    // for string payloads, UnsafeRow image for struct payloads)
    val payloads = new Array[Array[Byte]](b.size)
    var i = 0
    while (i < b.size) {
      payloads(i) =
        if (isStruct)
          // .copy() before getBytes: the projection reuses ONE output
          // buffer across applies, and getBytes returns that backing
          // array as-is when it is exact-size — without the copy every
          // serialized payload aliases the LAST projected element
          toUnsafe(b.vals(i).asInstanceOf[InternalRow]).copy().getBytes
        else b.vals(i).asInstanceOf[UTF8String].getBytes
      i += 1
    }
    var total = 4
    i = 0
    while (i < b.size) { total += 12 + payloads(i).length; i += 1 }
    val out = new Array[Byte](total)
    MinKSerde.putInt(out, 0, b.size)
    var off = 4
    i = 0
    while (i < b.size) {
      MinKSerde.putLong(out, off, b.keys(i))
      MinKSerde.putInt(out, off + 8, payloads(i).length)
      System.arraycopy(payloads(i), 0, out, off + 12, payloads(i).length)
      off += 12 + payloads(i).length
      i += 1
    }
    out
  }

  override def deserialize(bytes: Array[Byte]): MinKBuf = {
    val h = new MinKByHeap(k, payloadCmp)
    val n = MinKSerde.getInt(bytes, 0)
    var off = 4
    var i = 0
    // serialized order IS heap-array order; positional restore keeps
    // the heap invariant without re-sifting
    while (i < n) {
      h.keys(i) = MinKSerde.getLong(bytes, off)
      val len = MinKSerde.getInt(bytes, off + 8)
      val arr = new Array[Byte](len)
      System.arraycopy(bytes, off + 12, arr, 0, len)
      h.vals(i) =
        if (isStruct) {
          val r = new org.apache.spark.sql.catalyst.expressions.UnsafeRow(
            structType.fields.length)
          r.pointTo(arr, len)
          r
        } else UTF8String.fromBytes(arr)
      off += 12 + len
      i += 1
    }
    h.size = n
    h
  }

  override def dataType: DataType =
    ArrayType(payload.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "min_k_by"

  override def withNewMutableAggBufferOffset(offset: Int): MinKBy =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MinKBy =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinKBy =
    copy(left = newLeft, right = newRight)
}

/** Shared fixed-width big-endian codec for the MinK serdes. */
private[functions] object MinKSerde {
  def putInt(out: Array[Byte], pos: Int, v: Int): Unit = {
    out(pos) = (v >>> 24).toByte
    out(pos + 1) = (v >>> 16).toByte
    out(pos + 2) = (v >>> 8).toByte
    out(pos + 3) = v.toByte
  }
  def getInt(in: Array[Byte], pos: Int): Int =
    ((in(pos) & 0xff) << 24) | ((in(pos + 1) & 0xff) << 16) |
      ((in(pos + 2) & 0xff) << 8) | (in(pos + 3) & 0xff)
  def putLong(out: Array[Byte], pos: Int, v: Long): Unit = {
    putInt(out, pos, (v >>> 32).toInt)
    putInt(out, pos + 4, v.toInt)
  }
  def getLong(in: Array[Byte], pos: Int): Long =
    (getInt(in, pos).toLong << 32) | (getInt(in, pos + 4).toLong & 0xffffffffL)
}

object MinKAgg {
  /** Column form: ascending array of the k smallest non-null values of
    * `c` (duplicates kept) — UTF-8 byte order for a string column,
    * signed ordinal order for a bigint column. */
  def minK(c: Column, k: Int): Column =
    Bridge.column(MinK(Bridge.expression(c), k).toAggregateExpression())

  /** Column form: the k payloads with the smallest (key, payload)
    * pairs, ascending — `row_number() OVER (ORDER BY key, payload)
    * <= k` as a bounded one-scan aggregate. Payload may be a
    * binary-collated string or a struct of bigint/int/double/
    * timestamp/string fields (field-wise tie-break, typed
    * `array<struct<...>>` output). */
  def minKBy(key: Column, payload: Column, k: Int): Column =
    Bridge.column(MinKBy(Bridge.expression(key),
      Bridge.expression(payload), k).toAggregateExpression())
}

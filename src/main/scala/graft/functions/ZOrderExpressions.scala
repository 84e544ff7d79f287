package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Morton (z-order) curve key: interleaves the low `bits` bits of two
  * non-negative long coordinates (x on even positions, y on odd), mapping
  * 2-D proximity onto 1-D key proximity.
  *
  * Why a native expression: the composable per-bit formula is ~4 column
  * ops per bit (40+ expression nodes at 10 bits); the magic-number spread
  * (Bit Twiddling Hacks, "Interleave bits by Binary Magic Numbers" —
  * public domain) is 10 shift/mask ops per operand inside one codegen'd
  * method, and the z-key is computed once per row over the whole table
  * when re-clustering a 100 TB lake (see [[graft.ops.LayoutOps]]).
  *
  * Inputs are masked to `bits` low bits, so out-of-range coordinates wrap
  * rather than corrupting neighbors' positions; callers bucket/normalize
  * first. Null if either input is null.
  */
case class InterleaveBits(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "interleave_bits"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"interleave_bits expects (bigint, bigint), got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")

  private val mask: Long = (1L << bits) - 1

  override def nullSafeEval(a: Any, b: Any): Any =
    InterleaveBits.interleave(a.asInstanceOf[Long] & mask,
      b.asInstanceOf[Long] & mask)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cls = InterleaveBits.getClass.getName.stripSuffix("$")
      s"""
         |${ev.value} = $cls.interleave($a & ${mask}L, $b & ${mask}L);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object InterleaveBits {
  /** Spread the low 32 bits of v so bit i lands at position 2i. */
  def spread(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Morton interleave: x on even bit positions, y on odd. */
  def interleave(x: Long, y: Long): Long = spread(x) | (spread(y) << 1)
}

object ZOrderFunctions {
  /** Codegen'd Morton key over two integral columns (cast to long). */
  def zorder_key(x: Column, y: Column, bits: Int): Column =
    Bridge.column(InterleaveBits(Bridge.expression(x.cast("long")),
      Bridge.expression(y.cast("long")), bits))
}

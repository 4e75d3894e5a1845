package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen'd 2-D Morton (Z-order) code: interleave the low 31 bits of two
  * longs into one POSITIVE 62-bit key (31 bits per dimension keeps the key
  * out of the sign bit, so range-partitioning and external mirrors need no
  * unsigned-shift semantics). Sorting / range-partitioning on the key
  * CO-LOCATES rows close in BOTH dimensions, so min-max file statistics
  * prune scans for predicates on either column — the standard lakehouse
  * multi-dimensional clustering trick (Z-ordering), which a 100 TB corpus
  * uses to make `user_id = ? AND ts BETWEEN ...` style scans touch a few
  * files instead of all of them.
  *
  * Bit spreading uses the classic mask-shift cascade (public-domain "Bit
  * Twiddling Hacks" Morton-code construction), 5 steps per dimension —
  * pure integer ops, identical on any engine, so an external oracle can
  * mirror the key bit-for-bit with shifts and masks.
  */
case class MortonInterleave(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"morton2 needs (bigint, bigint), got ${left.dataType} / ${right.dataType}")

  override def dataType: DataType = LongType
  override def prettyName: String = "morton2"

  override def nullSafeEval(l: Any, r: Any): Any =
    MortonInterleave.interleave(l.asInstanceOf[Long], r.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.MortonInterleave.interleave($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object MortonInterleave {
  /** Spread the low 31 bits of v (one zero bit between each). */
  def spread(v: Long): Long = {
    var x = v & 0x7FFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8))  & 0x00FF00FF00FF00FFL
    x = (x | (x << 4))  & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2))  & 0x3333333333333333L
    x = (x | (x << 1))  & 0x5555555555555555L
    x
  }
  /** a's bits land in even positions, b's in odd. */
  def interleave(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)
}

/** Codegen'd 3-D Morton code: interleave the low 21 bits of three longs
  * into one POSITIVE 63-bit key (21 x 3 = 63 keeps the sign bit clear) —
  * the third stats dimension `ZOrderNode` previously could not lay out
  * (tenant x time x shard is the canonical 100 TB shape). Same mask-shift
  * cascade family as [[MortonInterleave]] (the standard 3-way Morton
  * magic constants); pure integer ops, mirrorable bit-for-bit by any
  * external oracle.
  */
case class Morton3Interleave(first: Expression, second: Expression, third: Expression)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (children.forall(_.dataType == LongType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"morton3 needs (bigint, bigint, bigint), got ${children.map(_.dataType).mkString(" / ")}")

  override def dataType: DataType = LongType
  override def prettyName: String = "morton3"

  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    Morton3Interleave.interleave3(
      a.asInstanceOf[Long], b.asInstanceOf[Long], c.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) =>
      s"${ev.value} = graft.functions.Morton3Interleave.interleave3($a, $b, $c);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object Morton3Interleave {
  /** Spread the low 21 bits of v (two zero bits between each). */
  def spread3(v: Long): Long = {
    var x = v & 0x1FFFFFL
    x = (x | (x << 32)) & 0x001F00000000FFFFL
    x = (x | (x << 16)) & 0x001F0000FF0000FFL
    x = (x | (x << 8))  & 0x100F00F00F00F00FL
    x = (x | (x << 4))  & 0x10C30C30C30C30C3L
    x = (x | (x << 2))  & 0x1249249249249249L
    x
  }
  /** a's bits land at positions ≡ 0 (mod 3), b's ≡ 1, c's ≡ 2. */
  def interleave3(a: Long, b: Long, c: Long): Long =
    spread3(a) | (spread3(b) << 1) | (spread3(c) << 2)
}

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

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Bit-interleaving kernel for [[ZOrderLong]] — also called from the
  * generated code.
  */
object ZOrderKernel {
  /** Interleave the low `bits` bits of `a` (even positions) and `b`
    * (odd positions). Inputs are masked to `bits`; callers rescale
    * negative or wide domains first.
    */
  def interleave(a: Long, b: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((a >>> i) & 1L) << (2 * i)
      z |= ((b >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }
}

/** `zorder(a, b)`: the Morton (Z-order) code of two long columns —
  * the multi-dimension LAYOUT key (SURVEY §2's deferred "Z-order /
  * tag1 layout tuning"). Rows sorted by this key cluster in BOTH
  * dimensions at once, so parquet min/max stats prune point/range
  * predicates on EITHER column — unlike a lexicographic sort, which
  * skips only on its leading column. Write-time only; never appears
  * in query plans.
  */
case class ZOrderLong(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")

  // inputs are cast to long by the Column wrapper
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrderKernel.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ZOrderKernel.interleave($a, $b, $bits)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderLong =
    copy(left = newLeft, right = newRight)
}

object ZOrder {
  def zorder(a: Column, b: Column, bits: Int = 21): Column =
    GraftExpressionBridge.column(ZOrderLong(
      GraftExpressionBridge.expression(a.cast("long")),
      GraftExpressionBridge.expression(b.cast("long")), bits))
}

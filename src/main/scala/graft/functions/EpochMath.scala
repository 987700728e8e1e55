package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Reinterpret a TIMESTAMP_NTZ as epoch-UTC microseconds — a zero-cost
  * identity over the physical representation.
  *
  * Spark stores TIMESTAMP_NTZ as microseconds since epoch of the WALL
  * time; the engine runs with `spark.sql.session.timeZone=UTC` (set by
  * every entry point), under which the wall clock IS the instant, so
  * the stored long is exactly `unix_micros`. The built-in route —
  * `unix_micros(cast(ntz as timestamp))` — goes through the NTZ→LTZ
  * cast, which calls the java.time zone-conversion machinery per row;
  * with the time expression duplicated into pushed-down filters that
  * cost lands 4–6× per scanned row on the PromQL/render hot path.
  * This expression emits the child's long unchanged.
  */
case class NtzEpochMicros(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "ntz_epoch_micros"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case TimestampNTZType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects timestamp_ntz, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any = input.asInstanceOf[Long]

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => c)

  override protected def withNewChildInternal(newChild: Expression): NtzEpochMicros =
    copy(child = newChild)
}

object EpochMath {
  /** `ntz_epoch_micros(c)` as a Column. */
  def ntzEpochMicros(c: Column): Column =
    GraftExpressionBridge.column(NtzEpochMicros(GraftExpressionBridge.expression(c)))
}

package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The text-normalization kernel shared by eval and codegen: Unicode
  * NFC composition, optional accent stripping (NFD → drop non-spacing
  * marks → recompose, the `unaccent` contract — characters with no
  * canonical decomposition, e.g. `ø`, pass through), optional ROOT
  * lower-casing, optional whitespace-run collapsing + trim. One
  * self-contained JVM object per expression instance so generated
  * code calls straight into it — no reflection, no per-row setup.
  */
final class TextNormalizer(
    val stripAccents: Boolean,
    val caseFold: Boolean,
    val collapseWs: Boolean) extends Serializable {

  def normalize(u: UTF8String): UTF8String = {
    var s = Normalizer.normalize(u.toString, Normalizer.Form.NFC)
    if (stripAccents) {
      val d = Normalizer.normalize(s, Normalizer.Form.NFD)
      val sb = new java.lang.StringBuilder(d.length)
      d.codePoints().forEach { cp =>
        if (Character.getType(cp) != Character.NON_SPACING_MARK)
          sb.appendCodePoint(cp)
      }
      s = Normalizer.normalize(sb.toString, Normalizer.Form.NFC)
    }
    if (caseFold) s = s.toLowerCase(java.util.Locale.ROOT)
    if (collapseWs) s = s.replaceAll("\\s+", " ").trim
    UTF8String.fromString(s)
  }
}

/** `normalize_text(s)` — native Catalyst expression for the dedup-key
  * normalization pass (the [[graft.llm.Dedup.normalizedText]] contract
  * extended to Unicode): NFC + strip accents + lowercase + collapse
  * whitespace. A codegen'd expression (not a UDF) so it stays inside
  * the whole-stage-codegen span of the document scan — at corpus
  * scale this is a map-only pass fused with the parquet reader.
  */
case class NormalizeText(
    child: Expression,
    stripAccents: Boolean = true,
    caseFold: Boolean = true,
    collapseWs: Boolean = true) extends UnaryExpression {

  @transient private lazy val normalizer =
    new TextNormalizer(stripAccents, caseFold, collapseWs)

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    normalizer.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj(
      "textNormalizer", normalizer, classOf[TextNormalizer].getName)
    defineCodeGen(ctx, ev, c => s"$ref.normalize($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)

  override def toString: String = s"normalize_text($child)"
}

object NormalizeText {

  /** Column wrapper with the full dedup-key pipeline on. */
  def column(text: Column): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      NormalizeText(
        org.apache.spark.sql.GraftExpressionBridge.expression(text)))

  def column(
      text: Column,
      stripAccents: Boolean,
      caseFold: Boolean,
      collapseWs: Boolean): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      NormalizeText(
        org.apache.spark.sql.GraftExpressionBridge.expression(text),
        stripAccents, caseFold, collapseWs))
}

package graft.functions

import java.math.RoundingMode

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The four Gopher repetition signals fused into ONE pass per
  * document — replacing four independent Column chains that each
  * re-split the text and run interpreted `aggregate` folds
  * (`TextStats.dupLineRatio` / `dupLineCharRatio` /
  * `topBigramCharRatio` / `dupTrigramRatio`, kept as the parity
  * reference). Hash-count formulations replace the sorted folds —
  * run-length over sorted equals is just a multiplicity count, and
  * the top-bigram tie ("first max in ascending order") is the
  * code-point-minimal gram, which UTF-8 byte order and `array_sort`
  * agree on. Rounding replicates Spark's `round(_, 6)`
  * (`BigDecimal.valueOf` + HALF_UP); lengths count code points like
  * `length()`. Bit-parity with the Column chains is pinned in
  * `RepetitionSpec`.
  */
final class RepetitionKernel extends Serializable {
  @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")

  private def trimSpark(s: String): String = UTF8String.fromString(s).trim().toString
  private def cp(s: String): Long = s.codePointCount(0, s.length).toLong
  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(6, RoundingMode.HALF_UP).doubleValue()

  /** Code-point lexicographic compare (== UTF-8 byte order). */
  private def cpLess(a: String, b: String): Boolean = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return ca < cb
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    a.length - i < b.length - j
  }

  def metrics(text: UTF8String): InternalRow = {
    val str = text.toString

    // lines: non-empty trimmed \n-splits
    val lineCounts = new java.util.HashMap[String, Long]()
    var nLines = 0L
    var totLineChars = 0L
    str.split("\n", -1).foreach { raw =>
      val l = trimSpark(raw)
      if (l.nonEmpty) {
        nLines += 1
        totLineChars += cp(l)
        lineCounts.merge(l, 1L, (a, b) => a + b)
      }
    }
    val dupLineRatio =
      if (nLines > 0) round6(1.0 - lineCounts.size.toDouble / nLines.toDouble)
      else 0.0
    var dupChars = 0L
    lineCounts.forEach { (l, c) => if (c > 1) dupChars += c * cp(l) }
    val dupLineCharRatio =
      if (totLineChars > 0) round6(dupChars.toDouble / totLineChars.toDouble)
      else 0.0

    // words: split(trim(text), "\s+") with Spark's limit semantics
    val wordsArr = ws.split(trimSpark(str), -1)
    var wordChars = 0L
    wordsArr.foreach(w => wordChars += cp(w))

    // top bigram: max count, ties to the code-point-smallest gram
    val nBi = wordsArr.length - 1
    var topBigramCharRatio = 0.0
    if (nBi >= 1 && wordChars > 0) {
      val biCounts = new java.util.HashMap[String, Long]()
      var i = 0
      while (i < nBi) {
        biCounts.merge(wordsArr(i) + " " + wordsArr(i + 1), 1L, (a, b) => a + b)
        i += 1
      }
      var bestCnt = 0L
      var bestGram: String = null
      biCounts.forEach { (g, c) =>
        if (c > bestCnt || (c == bestCnt && cpLess(g, bestGram))) {
          bestCnt = c; bestGram = g
        }
      }
      // gram chars exclude the joining space (words contain none)
      val gramChars = cp(bestGram) - 1
      topBigramCharRatio =
        round6(bestCnt.toDouble * gramChars.toDouble / wordChars.toDouble)
    }

    // trigram duplication: 1 − distinct/total
    val nTri = wordsArr.length - 2
    var dupTrigramRatio = 0.0
    if (nTri >= 1) {
      val seen = new java.util.HashSet[String]()
      var i = 0
      while (i < nTri) {
        seen.add(wordsArr(i) + " " + wordsArr(i + 1) + " " + wordsArr(i + 2))
        i += 1
      }
      dupTrigramRatio = round6(1.0 - seen.size.toDouble / nTri.toDouble)
    }

    new GenericInternalRow(Array[Any](
      dupLineRatio, dupLineCharRatio, topBigramCharRatio, dupTrigramRatio))
  }
}

/** `repetition_metrics(text)` → struct of the four Gopher signals. */
case class RepetitionMetricsExpr(child: Expression) extends UnaryExpression {
  @transient private lazy val kernel = new RepetitionKernel

  override def dataType: DataType = StructType(Seq(
    StructField("dup_line_ratio", DoubleType, nullable = false),
    StructField("dup_line_char_ratio", DoubleType, nullable = false),
    StructField("top_bigram_char_ratio", DoubleType, nullable = false),
    StructField("dup_trigram_ratio", DoubleType, nullable = false)))

  override def prettyName: String = "repetition_metrics"

  override protected def nullSafeEval(input: Any): Any =
    kernel.metrics(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("repKernel", kernel, classOf[RepetitionKernel].getName)
    defineCodeGen(ctx, ev, c => s"$ref.metrics($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionMetricsExpr =
    copy(child = newChild)
}

object RepetitionMetrics {
  def column(text: Column): Column =
    GraftExpressionBridge.column(
      RepetitionMetricsExpr(GraftExpressionBridge.expression(text)))
}

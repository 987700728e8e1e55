package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen vector folds — the scalar kernel under every
  * embedding operator (brute kNN, k-means, IVF assign, PQ, semantic
  * decon). The composed `aggregate(zip_with(a, b, _*_), 0.0, _+_)`
  * evaluates interpreted lambdas AND allocates an intermediate array
  * per row-pair; these expressions emit one fused whole-stage-codegen
  * loop over the two `ArrayData`s with a double accumulator — same
  * index-order accumulation, so results are bit-identical to the
  * fold (and to the DuckDB oracles' `list_sum(list_transform(…))`).
  *
  * Element types may be float or double on either side (parquet
  * embeddings are float; k-means/PQ centroids come out of `avg` as
  * double). Semantics vs the HOF composition: a NULL element
  * contributes 0 instead of nulling the whole product, and length
  * mismatch folds the common prefix — both degenerate for vector
  * data, where elements are non-null and dimensions equal.
  */
abstract class VecFold extends BinaryExpression {
  override def dataType: DataType = DoubleType

  /** java source of one accumulation term over doubles `x`, `y`. */
  protected def termCode(x: String, y: String): String
  protected def term(x: Double, y: Double): Double

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(et, _) => et
    case other            => other
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _                                    => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float|double> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]
    val bb = b.asInstanceOf[ArrayData]
    val (ta, tb) = (elemType(left), elemType(right))
    val n = math.min(aa.numElements(), bb.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!aa.isNullAt(i) && !bb.isNullAt(i)) {
        val x = if (ta == FloatType) aa.getFloat(i).toDouble else aa.getDouble(i)
        val y = if (tb == FloatType) bb.getFloat(i).toDouble else bb.getDouble(i)
        acc += term(x, y)
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val acc = ctx.freshName("acc")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val getA =
        if (elemType(left) == FloatType) s"(double) $a.getFloat($i)"
        else s"$a.getDouble($i)"
      val getB =
        if (elemType(right) == FloatType) s"(double) $b.getFloat($i)"
        else s"$b.getDouble($i)"
      s"""
         |double $acc = 0.0;
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    double $x = $getA;
         |    double $y = $getB;
         |    $acc += ${termCode(x, y)};
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
}

/** Σ aᵢ·bᵢ with double accumulation in index order. */
case class VecDot(left: Expression, right: Expression) extends VecFold {
  override def prettyName: String = "vec_dot"
  override protected def termCode(x: String, y: String): String = s"$x * $y"
  override protected def term(x: Double, y: Double): Double = x * y
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Σ (aᵢ−bᵢ)² with double accumulation in index order. */
case class VecL2Sq(left: Expression, right: Expression) extends VecFold {
  override def prettyName: String = "vec_l2sq"
  override protected def termCode(x: String, y: String): String =
    s"($x - $y) * ($x - $y)"
  override protected def term(x: Double, y: Double): Double = (x - y) * (x - y)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecL2Sq =
    copy(left = newLeft, right = newRight)
}

/** Jaccard similarity of two SORTED, DISTINCT string arrays — a
  * single merge pass with zero allocation, replacing
  * `size(array_intersect) / size(array_union)`, which rebuilds a
  * hash set for every PAIR (a document's words re-hashed once per
  * candidate pair). Callers pre-sort each side once per document;
  * set semantics make the value identical. Comparison is UTF-8 byte
  * order (what `array_sort` produces). Empty∩empty yields NaN like
  * the 0/0.0 division it replaces.
  */
case class SortedSetJaccard(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sorted_set_jaccard"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val bb = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    SortedSetJaccard.jaccard(aa, bb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = ${SortedSetJaccard.getClass.getName.stripSuffix("$")}.jaccard($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedSetJaccard =
    copy(left = newLeft, right = newRight)
}

object SortedSetJaccard {
  /** Merge-count |a∩b| over sorted inputs; |a∪b| = na + nb − inter. */
  def jaccard(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    val union = na + nb - inter
    if (union == 0) Double.NaN else inter.toDouble / union.toDouble
  }
}

object VecMath {
  def dot(a: Column, b: Column): Column =
    GraftExpressionBridge.column(VecDot(
      GraftExpressionBridge.expression(a), GraftExpressionBridge.expression(b)))

  def l2sq(a: Column, b: Column): Column =
    GraftExpressionBridge.column(VecL2Sq(
      GraftExpressionBridge.expression(a), GraftExpressionBridge.expression(b)))
}

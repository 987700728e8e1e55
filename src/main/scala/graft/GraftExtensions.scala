package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.unsafe.types.UTF8String

import graft.compiler.GlobMatch

/** SQL-level registration of the engine's custom expressions, so
  * `spark.sql("... WHERE glob_match(path, 'a.*.c')")` works alongside
  * the Column API.
  *
  * Deployment: `--conf spark.sql.extensions=graft.GraftExtensions`
  * (cluster-wide, applied at session build), or
  * `GraftFunctions.register(spark)` on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.descriptors.foreach(ext.injectFunction)
}

object GraftFunctions {

  private def buildGlobMatch(args: Seq[Expression]): Expression = {
    require(args.length == 2 || args.length == 3,
      "glob_match(path, glob[, optionalDotAtEnd]) expects 2 or 3 arguments")
    val glob = args(1) match {
      case Literal(s: UTF8String, _) => s.toString
      case other =>
        throw new IllegalArgumentException(s"glob must be a string literal, got $other")
    }
    val optDot = args.lift(2).forall {
      case Literal(b: Boolean, _) => b
      case _                      => false
    } && args.length == 3
    GlobMatch(args.head, glob, optDot)
  }

  val globMatchDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("glob_match"),
    new ExpressionInfo(classOf[GlobMatch].getName, "glob_match"),
    buildGlobMatch)

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(i: Int, _) => i
    case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }

  private def descriptor(
      name: String,
      clazz: Class[_],
      build: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name), build)

  /** Every custom expression, SQL-callable. */
  val descriptors: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    globMatchDescriptor,
    descriptor("normalize_text", classOf[graft.functions.NormalizeText], args => {
      require(args.length == 1, "normalize_text(text) expects 1 argument")
      graft.functions.NormalizeText(args.head)
    }),
    descriptor("vec_dot", classOf[graft.functions.VecDot], args => {
      require(args.length == 2, "vec_dot(a, b) expects 2 arguments")
      graft.functions.VecDot(args(0), args(1))
    }),
    descriptor("vec_l2sq", classOf[graft.functions.VecL2Sq], args => {
      require(args.length == 2, "vec_l2sq(a, b) expects 2 arguments")
      graft.functions.VecL2Sq(args(0), args(1))
    }),
    descriptor("word_shingles", classOf[graft.functions.WordShingles], args => {
      require(args.length == 2, "word_shingles(text, w) expects 2 arguments")
      graft.functions.WordShingles(args(0), intLit(args(1), "w"))
    }),
    descriptor("positional_shingles", classOf[graft.functions.PositionalShingles], args => {
      require(args.length == 2, "positional_shingles(words, w) expects 2 arguments")
      graft.functions.PositionalShingles(args(0), intLit(args(1), "w"))
    }),
    descriptor("zorder", classOf[graft.functions.ZOrderLong], args => {
      require(args.length == 2 || args.length == 3,
        "zorder(a, b[, bits]) expects 2 or 3 arguments")
      graft.functions.ZOrderLong(args(0), args(1),
        args.lift(2).map(intLit(_, "bits")).getOrElse(21))
    }),
    descriptor("dsir_buckets", classOf[graft.functions.DsirBuckets], args => {
      require(args.length == 2, "dsir_buckets(text, buckets) expects 2 arguments")
      graft.functions.DsirBuckets(args(0), intLit(args(1), "buckets"))
    }))

  /** Register on a live session (test/driver convenience). */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}

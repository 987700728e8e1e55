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
    ext.injectFunction(GraftFunctions.globMatchDescriptor)
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

  /** Register on a live session (test/driver convenience). */
  def register(spark: SparkSession): Unit = {
    val (_, info, builder) = globMatchDescriptor
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("glob_match"), info, builder)
  }
}

package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

/** Session extension registering the engine's SQL surface
  * (`spark.sql.extensions=graft.functions.GraftExtensions`, or
  * [[GraftExtensions.register]] on a live session).
  *
  *   graft_tokenize(text)             — standard analyzer
  *   graft_tokenize(text, 'analyzer') — named analyzer
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.tokenizeDescriptor)
  }
}

object GraftExtensions {

  private def build(args: Seq[Expression]): Expression = args match {
    case Seq(text) => TokenizeExpression(text, "standard")
    case Seq(text, Literal(name, _)) => TokenizeExpression(text, name.toString)
    case _ => throw new IllegalArgumentException(
      "graft_tokenize(text[, analyzerNameLiteral])")
  }

  val tokenizeDescriptor: (FunctionIdentifier, org.apache.spark.sql.catalyst.expressions.ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_tokenize"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[TokenizeExpression].getName, "graft_tokenize"),
    build _)

  /** Register on an already-built session (tests, Engine glue). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_tokenize", build, "built-in")
}

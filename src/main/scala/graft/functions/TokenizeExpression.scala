package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.analysis.{Analyzer, Analyzers}

/** Native Catalyst expression `graft_tokenize(text[, analyzer])` →
  * `array<struct<term string, pos int>>` — the engine's analyzer surface
  * exposed to Spark SQL as a codegen'd expression (no Scala UDF
  * serialization, stays inside whole-stage codegen; preference order per
  * the build brief: native Expression > UDF).
  *
  * The reference's equivalent surface is the JS index function + analyzer
  * selection (DocumentConverter.java:78-119, util/Analyzers.java:283-299);
  * here the analyzer is a constructor-bound constant so codegen references
  * it directly.
  */
final case class TokenizeExpression(child: Expression, analyzerName: String)
    extends UnaryExpression {

  @transient private lazy val analyzer: Analyzer = Analyzers.byName(analyzerName)

  override def dataType: DataType = TokenizeExpression.OutType

  override def nullSafeEval(input: Any): Any =
    TokenizeExpression.tokenize(analyzer, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val analyzerRef = ctx.addReferenceObj("analyzer", analyzer, classOf[Analyzer].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TokenizeExpression.tokenize($analyzerRef, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_tokenize"
}

object TokenizeExpression {
  val OutType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("pos", IntegerType, nullable = false))), containsNull = false)

  /** Shared kernel for interpreted eval and generated code. */
  def tokenize(analyzer: Analyzer, text: UTF8String): ArrayData = {
    val toks = analyzer.tokens(text.toString)
    val rows = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) {
      rows(i) = InternalRow(UTF8String.fromString(toks(i).term), toks(i).pos)
      i += 1
    }
    new GenericArrayData(rows)
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen-friendly vector fold for the similarity operators:
  * `Σ aᵢ·bᵢ` (dot) or `Σ (aᵢ−bᵢ)²` (l2sq) as ONE tight loop over the array
  * data, replacing the `aggregate(zip_with(...))` higher-order-function
  * formulation — HOFs are CodegenFallback in Spark, so every row paid an
  * interpreted lambda per element plus a zip_with intermediate array; this
  * was the dominant per-row cost of the ANN ops.
  *
  * Semantics are EXACTLY the old expression's, so the DuckDB-gated outputs
  * are bit-identical:
  *   - the fold is a left-to-right running double sum in index order (same
  *     IEEE association as `aggregate`'s `acc + v`);
  *   - float elements widen to double exactly (the old `x.cast("double")`);
  *   - a null array → null; mismatched lengths or a null element → null
  *     (zip_with pads with null, the lambda then yields null, and
  *     `acc + null` poisons the running sum to null).
  */
final case class VecFoldExpression(left: Expression, right: Expression, l2: Boolean)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"vec_fold needs array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any =
    VecFoldExpression.fold(a.asInstanceOf[ArrayData], isFloat(left),
      b.asInstanceOf[ArrayData], isFloat(right), l2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double ${ev.value}_r = graft.functions.VecFoldExpression.fold(
         |  $a, ${isFloat(left)}, $b, ${isFloat(right)}, $l2);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = if (l2) "graft_l2sq" else "graft_dot"
}

object VecFoldExpression {

  /** Shared kernel for interpreted eval and generated code. Returns null
    * (boxed) exactly when the old HOF expression did — see the class doc.
    */
  def fold(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean, l2: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      if (l2) { val d = x - y; s += d * d } else s += x * y
      i += 1
    }
    java.lang.Double.valueOf(s)
  }
}

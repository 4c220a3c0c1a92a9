package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expressions for quantized-vector math.
  *
  * The ANN operators ([[graft.operators.Similarity]]) verify every
  * candidate pair with an exact integer cosine; with the higher-order
  * `aggregate(zip_with(...))` form that inner loop is interpreted
  * (HOFs are CodegenFallback) and allocates a zipped array per pair —
  * measured ~10x slower than this kernel on the near-dup verify path,
  * where millions of candidate pairs each need a 64-element dot
  * product. The expression stays inside whole-stage codegen by
  * emitting a static-kernel call, like [[HashKernels]].
  */
object VectorKernels {
  /** Exact integer dot product of two long arrays (caller guarantees
    * equal length and quantized magnitudes small enough not to
    * overflow — |x| <= ~2e3 * QuantScale keeps 64-sums < 2^63).
    */
  def dotLong(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }
}

/** `dot_long(a, b)`: exact integer dot product of two `array<long>`
  * vectors; `dot_long(a, a)` is the squared norm.
  */
case class DotLong(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot_long needs two ARRAY<BIGINT>, got ${left.dataType}, ${right.dataType}")
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dotLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernels.dotLong($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotLong =
    copy(l, r)
}

object VectorFunctions {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
  def dot_long(a: Column, b: Column): Column =
    column(DotLong(expression(a), expression(b)))
}

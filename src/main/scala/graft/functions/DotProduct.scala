package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native codegen'd dot product over two float-array columns, in
  * sequential left-fold DOUBLE arithmetic — bit-identical to
  * `aggregate(transform(sequence(...), i -> a[i]*b[i]), 0d, +)` (and to
  * the DuckDB oracle's `list_reduce` fold) but a single JIT'd loop
  * instead of per-element Catalyst expression dispatch.
  *
  * This is the (b)-tier extension for the ANN hot path: the interpreted
  * higher-order-function formulation measured ~3 s for the
  * embedding-near-dup query at sf0.1; the expression drops it to the
  * join cost.
  */
case class FloatDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_dot"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def matches(dt: DataType) = dt match {
      case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, _) => true
      case _ => false
    }
    if (matches(left.dataType) && matches(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"float_dot requires two ARRAY<FLOAT> arguments, got (${left.dataType}, ${right.dataType})")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    FloatDot.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.FloatDot.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDot =
    copy(left = newLeft, right = newRight)
}

object FloatDot {
  /** Sequential left fold in double — the exact summation order the
    * oracle uses; do not reorder/vectorize without changing the oracle.
    */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  def floatDot(a: Column, b: Column): Column =
    GraftBridge.column(FloatDot(GraftBridge.expression(a), GraftBridge.expression(b)))
}

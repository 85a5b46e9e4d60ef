package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing the reference's task-routing
  * hash: FNV-1a 32-bit masked to 31 bits
  * (ref: mr/worker.go:29-33 — `fnv.New32a` then `& 0x7fffffff`).
  *
  * Byte-exact parity with Go's `hash/fnv` on the UTF-8 bytes of the
  * input. Implemented as a `UnaryExpression` with `doGenCode`, so it
  * participates in whole-stage codegen (a Scala UDF would box every row
  * and break the codegen span; see SURVEY §7.3).
  */
case class Fnv1a32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"fnv1a32 requires a string argument, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "fnv1a32"

  override def nullSafeEval(input: Any): Any =
    Fnv1a32.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fnv1a32.hash($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Fnv1a32 =
    copy(child = newChild)
}

object Fnv1a32 {
  private final val OffsetBasis = 2166136261L
  private final val Prime = 16777619L

  /** FNV-1a 32-bit over raw bytes, masked to 31 bits (Go parity). */
  def hash(bytes: Array[Byte]): Long = {
    var h = OffsetBasis
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h = (h * Prime) & 0xffffffffL
      i += 1
    }
    h & 0x7fffffffL
  }

  /** Column API: `fnv1a32(col)`. */
  def fnv1a32(c: Column): Column =
    GraftBridge.column(Fnv1a32(GraftBridge.expression(c)))
}

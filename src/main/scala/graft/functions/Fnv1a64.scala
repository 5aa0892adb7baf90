package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** FNV-1a 64-bit hash of a string's UTF-8 bytes as a native Catalyst
  * expression with whole-stage codegen (SURVEY.md §2.13 `x_expr_custom`).
  *
  * A codegen'd Expression keeps token/document fingerprinting inside the
  * generated operator loop — no UDF serialization boundary, no boxing —
  * which is what makes hash-heavy pipeline ops (dedup, shingling) viable
  * at 100 TB.
  */
case class Fnv1a64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  // Seq[DataType] <: Seq[AbstractDataType] (covariance) — AbstractDataType
  // itself is private[sql] and cannot be named here.
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "fnv1a64"

  override protected def nullSafeEval(input: Any): Any =
    Fnv1a64.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fnv1a64.hash($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Fnv1a64 =
    copy(child = newChild)
}

object Fnv1a64 {
  def hash(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Column-level entry point: fnv1a64(col). */
  def apply(c: Column): Column =
    org.apache.spark.sql.graft.Shim.column(
      Fnv1a64(org.apache.spark.sql.graft.Shim.expression(c)))
}

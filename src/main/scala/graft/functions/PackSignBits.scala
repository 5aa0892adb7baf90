package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Packs the signs of the first 64 elements of a double array into one
  * BIGINT word (bit i set ⟺ v[i] ≥ 0) as a single codegen'd loop —
  * semantically identical to the HOF
  * `aggregate(sequence(0, 63), 0L, (acc, i) ->
  *   acc + IF(v[i+1] >= 0, shiftleft(1L, i), 0L))`
  * (each bit is distinct, so the sum IS the bitwise OR), but without 64
  * interpreted lambda steps per row — the binary-embedding compression
  * kernel next to [[ArrayDot]]. Shorter arrays pack their available
  * dims; null elements throw like ArrayDot.
  */
case class PackSignBits(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pack_sign_bits"

  override protected def nullSafeEval(a: Any): Any =
    PackSignBits.pack(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.PackSignBits.pack($a)")

  override protected def withNewChildInternal(newChild: Expression): PackSignBits =
    copy(child = newChild)
}

object PackSignBits {
  def pack(a: ArrayData): Long = {
    val n = math.min(a.numElements(), 64)
    var h = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) {
        throw new IllegalArgumentException(
          s"pack_sign_bits: null element at index $i — vectors must be null-free")
      }
      if (a.getDouble(i) >= 0) h |= (1L << i)
      i += 1
    }
    h
  }

  def of(a: Column): Column = Shim.column(PackSignBits(Shim.expression(a)))
}

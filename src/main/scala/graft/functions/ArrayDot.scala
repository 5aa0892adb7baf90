package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Dot product of two double arrays as a single codegen'd loop over the
  * underlying (unsafe) array data — semantically identical to
  * `aggregate(zip_with(a, b, (x, y) => x * y), 0.0, (acc, x) => acc + x)`
  * on null-free equal-length arrays (same left-to-right IEEE summation
  * order), but without materializing the intermediate product array and
  * without per-element lambda interpretation. The hot kernel of the
  * embedding family (cosine top-k, IVF/LSH ANN, near-dup pairs).
  *
  * Inputs are embedding vectors: expected null-free and equal-length.
  * Ragged input truncates to the shorter length (documented, tested);
  * a null ELEMENT throws a descriptive error instead of silently
  * reading undefined data (0.0 on UnsafeArrayData / NPE elsewhere).
  */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "array_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrayDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ArrayDot.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}

object ArrayDot {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) {
        throw new IllegalArgumentException(
          s"array_dot: null element at index $i — vectors must be null-free")
      }
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }
}

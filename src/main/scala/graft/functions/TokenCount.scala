package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Number of single-space-separated tokens in a string, computed by a
  * byte scan — semantically identical to `size(split(s, ' ', -1))` (Java
  * split with limit -1 keeps trailing empties, so size == spaces + 1)
  * but without materializing the token array. UTF-8 guarantees 0x20
  * never occurs in continuation bytes, so the byte scan is exact.
  *
  * Installed by [[graft.GraftExtensions]] both as the SQL function
  * `token_count` and as the target of the `OptimizeTokenCount` rewrite.
  */
case class TokenCount(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_count"

  override protected def nullSafeEval(input: Any): Any =
    TokenCount.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenCount.count($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenCount =
    copy(child = newChild)
}

object TokenCount {
  def count(s: UTF8String): Int = {
    val n = s.numBytes()
    var spaces = 0
    var i = 0
    while (i < n) {
      if (s.getByte(i) == 0x20) spaces += 1
      i += 1
    }
    spaces + 1
  }
}

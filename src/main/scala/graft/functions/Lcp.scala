package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Longest-common-prefix length (in CHARACTERS) of two strings as one
  * codegen'd byte loop — semantically identical to the HOF form
  * `size(filter(sequence(1, least(length(a), length(b))),
  * i -> substring(a, 1, i) = substring(b, 1, i)))` (prefix matching is
  * monotone in length, so the filter-count equals the LCP), but without
  * an interpreted per-character lambda and without the ~5 s one-shot
  * codegen the 3-level HOF cost q_idx_prefix at every fresh JVM
  * (measured in the round-8 isolation re-time). The byte-level common
  * prefix is truncated back to a UTF-8 character boundary before the
  * char count, so multi-byte text gets the same answer `substring`
  * comparison gives.
  */
case class Lcp(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lcp"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Lcp.lcp(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Lcp.lcp($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Lcp =
    copy(left = newLeft, right = newRight)
}

object Lcp {
  def lcp(a: UTF8String, b: UTF8String): Int = {
    val ab = a.getBytes
    val bb = b.getBytes
    val n = math.min(ab.length, bb.length)
    var i = 0
    while (i < n && ab(i) == bb(i)) i += 1
    // if the mismatch falls inside a multi-byte char, back off to that
    // char's start so only COMPLETE common characters count
    while (i > 0 && i < ab.length && (ab(i) & 0xC0) == 0x80) i -= 1
    UTF8String.fromBytes(ab, 0, i).numChars()
  }

  /** Column entry point (the VectorOps.dot convention). */
  def of(a: Column, b: Column): Column =
    Shim.column(Lcp(Shim.expression(a), Shim.expression(b)))
}

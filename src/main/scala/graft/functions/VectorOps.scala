package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.graft.Shim

/** Column-level entry points for the native vector kernels — usable in
  * any session (the expression is embedded directly; no function-registry
  * registration required).
  */
object VectorOps {
  def dot(a: Column, b: Column): Column =
    Shim.column(ArrayDot(Shim.expression(a), Shim.expression(b)))

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2norm(a) * l2norm(b))
}

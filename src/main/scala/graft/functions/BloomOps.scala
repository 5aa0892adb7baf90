package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.Shim

/** Column-level entry points for Spark's bloom-filter expressions — the
  * same machinery Catalyst's runtime-filter rewrite injects under joins
  * (`InjectRuntimeFilter`), exposed for explicit pipeline use. Not in the
  * public SQL registry, hence the direct expression bridge.
  */
object BloomOps {

  /** Mergeable bloom-filter aggregate over xxhash64 values: partial
    * filters OR together, so the build is one partial+final agg with no
    * row shuffle. */
  def bloomFilterAgg(hashes: Column, estItems: Long, numBits: Long): Column =
    Shim.column(BloomFilterAggregate(
      Shim.expression(hashes),
      org.apache.spark.sql.catalyst.expressions.Literal(estItems),
      org.apache.spark.sql.catalyst.expressions.Literal(numBits),
      0, 0).toAggregateExpression())

  /** Membership probe against a built filter (possible false positives,
    * no false negatives). */
  def mightContain(filter: Column, hash: Column): Column =
    Shim.column(BloomFilterMightContain(
      Shim.expression(filter), Shim.expression(hash)))
}

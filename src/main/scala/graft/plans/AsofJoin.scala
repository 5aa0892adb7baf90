package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types.{ByteType, DateType, IntegerType, LongType, ShortType, TimestampType, TimestampNTZType}

/** AS-OF join as a first-class Catalyst operator — the (c)-tier custom
  * surface (SURVEY.md §4.3): logical node + planner strategy + physical
  * exec, registered through `SparkSessionExtensions` /
  * `spark.experimental.extraStrategies`.
  *
  * Semantics: for every left row, the SINGLE latest right row with the
  * same key and `right.time <= left.time` (LEFT OUTER — unmatched left
  * rows carry nulls), i.e. DuckDB's `ASOF LEFT JOIN` and the classic
  * point-in-time lookup Spark lacks natively. q_join_asof's
  * broadcast-binary-search formulation covers the KEYLESS case; this
  * operator is the keyed, fully distributed form.
  *
  * Scale design: EnsureRequirements clusters both children by key and
  * sorts them by (key, time) — one shuffle per side, exactly a
  * sort-merge join's cost envelope — then each partition runs a linear
  * two-pointer merge that keeps ONE buffered right row and the current
  * last-match: O(|L| + |R|) time, O(1) state, no per-key buffering, no
  * window. A window formulation (union + last over unbounded-preceding)
  * would carry the merged stream through per-key window state instead.
  *
  * Keys and times must be integral-comparable types (ints, longs,
  * timestamps, dates) — validated up front in [[AsofOps.join]]; null
  * keys/times never match (equi-join convention).
  */
case class AsofJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, rk, lt, rt) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    SortOrder(leftKey, Ascending) :: SortOrder(leftTime, Ascending) :: Nil,
    SortOrder(rightKey, Ascending) :: SortOrder(rightTime, Ascending) :: Nil)

  override def outputOrdering: Seq[SortOrder] =
    SortOrder(leftKey, Ascending) :: SortOrder(leftTime, Ascending) :: Nil

  override def outputPartitioning: Partitioning = left.outputPartitioning

  /** Integral-comparable eval (AsofOps.join validated the types). */
  private def asLong(a: Any): Long = a match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
  }

  protected override def doExecute(): RDD[InternalRow] = {
    val lkB = BindReferences.bindReference(leftKey, left.output)
    val ltB = BindReferences.bindReference(leftTime, left.output)
    val rkB = BindReferences.bindReference(rightKey, right.output)
    val rtB = BindReferences.bindReference(rightTime, right.output)
    val rightWidth = right.output.size
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      // one-row lookahead over the right side; null-keyed rows skipped
      var rHead: InternalRow = null
      var rHeadKey = 0L
      var rHeadTime = 0L
      def advance(): Unit = {
        rHead = null
        while (rHead == null && rIter.hasNext) {
          val r = rIter.next()
          val k = rkB.eval(r)
          val t = rtB.eval(r)
          if (k != null && t != null) {
            rHead = r.copy() // iterator rows are reused; the buffered
            rHeadKey = asLong(k) // match must survive past next()
            rHeadTime = asLong(t)
          }
        }
      }
      advance()
      var lastMatch: InternalRow = null
      var lastMatchKey = 0L
      lIter.map { lRow =>
        val kAny = lkB.eval(lRow)
        val tAny = ltB.eval(lRow)
        if (kAny == null || tAny == null) proj(joined(lRow, nullRight))
        else {
          val k = asLong(kAny)
          val t = asLong(tAny)
          // consume right rows that are behind (key < k) or eligible
          // (key == k, time <= t); the latest eligible one is the match
          while (rHead != null && (rHeadKey < k ||
              (rHeadKey == k && rHeadTime <= t))) {
            if (rHeadKey == k) { lastMatch = rHead; lastMatchKey = k }
            advance()
          }
          val hit = lastMatch != null && lastMatchKey == k
          proj(joined(lRow, if (hit) lastMatch else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level entry point. */
object AsofOps {
  private val ok = Seq(ByteType, ShortType, IntegerType, LongType,
    TimestampType, TimestampNTZType, DateType)

  /** `left ASOF LEFT JOIN right ON leftKey = rightKey AND rightTime <=
    * leftTime` keeping the latest eligible right row. Right rows should
    * be unique per (key, time) — with duplicates, which one survives
    * follows the partition sort's tie order (aggregate the right side
    * first for a deterministic result).
    */
  def join(l: DataFrame, r: DataFrame, leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column): DataFrame = {
    val (lk, rk) = (Shim.expression(leftKey), Shim.expression(rightKey))
    val (lt, rt) = (Shim.expression(leftTime), Shim.expression(rightTime))
    Seq(lk, rk, lt, rt).foreach { e =>
      require(ok.contains(e.dataType),
        s"asof join key/time must be integral-comparable, got ${e.dataType}")
    }
    // Cross-side type equality, same fail-fast rationale as the lineage
    // guard below: an Int-vs-Long key pair hash-partitions equal values
    // to DIFFERENT partitions (Murmur3 hashInt != hashLong), and a
    // Date-vs-Timestamp time pair compares days against micros — both
    // produce silently wrong (empty-match) output, not an error.
    require(lk.dataType == rk.dataType,
      s"asof join key types must match, got ${lk.dataType} vs ${rk.dataType}")
    require(lt.dataType == rt.dataType,
      s"asof join time types must match, got ${lt.dataType} vs ${rt.dataType}")
    val (la, ra) = (l.queryExecution.analyzed, r.queryExecution.analyzed)
    // Self-join lineage guard: AsofJoinPlan bypasses the Analyzer's
    // dedupRight, so shared exprIds across the two sides would make
    // BindReferences resolve right-side columns to the left occurrence —
    // silently wrong output. Fail fast instead; callers alias one side.
    val shared = la.outputSet.intersect(ra.outputSet)
    require(shared.isEmpty,
      s"asof join sides must not share output attributes (got $shared); " +
        "alias one side, e.g. right.select(col(\"k\").as(\"rk\"), ...)")
    Shim.ofRows(l.sparkSession, AsofJoinPlan(la, ra, lk, rk, lt, rt))
  }
}

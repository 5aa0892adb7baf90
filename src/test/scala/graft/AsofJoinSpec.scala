package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.AsofOps

/** The custom AsofJoinExec operator (graft/plans/AsofJoin.scala):
  * edge-case semantics on hand-built frames, equality with a
  * window-based reference formulation on real data, and the physical
  * plan contract (strategy fires, children clustered + sorted).
  */
class AsofJoinSpec extends SparkSpecBase {
  private val sp = spark
  import sp.implicits._

  private def asof(l: org.apache.spark.sql.DataFrame,
      r: org.apache.spark.sql.DataFrame) =
    AsofOps.join(l, r, l("k"), r("rk"), l("t"), r("rt"))

  test("matches the latest right row at or before each left time") {
    val l = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "c"))
      .toDF("k", "t", "tag")
    val r = Seq((1L, 10L, "x"), (1L, 15L, "y"), (1L, 30L, "z"))
      .toDF("rk", "rt", "v")
    val got = asof(l, r).select("tag", "v").collect()
      .map(x => x.getString(0) -> x.getString(1)).toMap
    assert(got == Map("a" -> "x", "b" -> "y", "c" -> null))
  }

  test("keys never leak: a left key with no right rows gets nulls") {
    val l = Seq((1L, 10L), (2L, 10L), (3L, 10L)).toDF("k", "t")
    val r = Seq((2L, 1L, "only")).toDF("rk", "rt", "v")
    val got = asof(l, r).select("k", "v").collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(got == Map(1L -> null, 2L -> "only", 3L -> null))
  }

  test("null keys and times never match (equi-join convention)") {
    val l = Seq((Some(1L), Some(10L)), (None, Some(10L)), (Some(1L), None))
      .toDF("k", "t")
    val r = Seq((Some(1L), Some(5L), "m")).toDF("rk", "rt", "v")
    val got = asof(l, r).select("v").collect().map(_.getString(0))
    assert(got.count(_ == "m") == 1 && got.count(_ == null) == 2)
  }

  test("equal timestamps are inclusive (rt <= lt)") {
    val l = Seq((7L, 100L)).toDF("k", "t")
    val r = Seq((7L, 100L, "eq")).toDF("rk", "rt", "v")
    assert(asof(l, r).select("v").head.getString(0) == "eq")
  }

  test("agrees with the window-based reference on the events table") {
    val ev = Tables.events(spark, sf)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("k"), col("event_id"),
        unix_micros(col("ts")).as("t"))
    val purch = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id").as("rk"), unix_micros(col("ts")).as("rt"))
      .agg(max("event_id").as("pid"))
    val got = asof(clicks, purch)
      .select("event_id", "pid").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.toString).orNull)
      .toMap
    // reference: plain range join + keep latest by row_number
    val ref = clicks.join(purch,
        col("k") === col("rk") && col("rt") <= col("t"), "left")
      .withColumn("rn", row_number().over(Window
        .partitionBy("event_id").orderBy(desc_nulls_last("rt"))))
      .filter(col("rn") === 1)
      .select("event_id", "pid").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.toString).orNull)
      .toMap
    assert(got.size == ref.size && got == ref)
  }

  test("agrees with the window reference on randomized collision-heavy frames") {
    // Tiny key/time domains force duplicate keys, duplicate times, and
    // per-key runs spanning partition boundaries — the states the
    // two-pointer merge has to get right. Seeded, so deterministic.
    val rnd = new scala.util.Random(20260813L)
    for (_ <- 1 to 3) {
      val lRows = Seq.tabulate(150 + rnd.nextInt(100)) { i =>
        (if (rnd.nextInt(12) == 0) None else Some(rnd.nextInt(6).toLong),
          if (rnd.nextInt(12) == 0) None else Some(rnd.nextInt(25).toLong),
          i.toLong)
      }
      val rRows = Seq.tabulate(120 + rnd.nextInt(100)) { _ =>
        (if (rnd.nextInt(12) == 0) None else Some(rnd.nextInt(6).toLong),
          if (rnd.nextInt(12) == 0) None else Some(rnd.nextInt(25).toLong),
          rnd.nextInt(1000).toLong)
      }
      val l = lRows.toDF("k", "t", "lid").repartition(7)
      // dedupe right per (key, time): with duplicates the operator's
      // survivor follows the partition sort's tie order (documented in
      // AsofOps.join), so aggregate first to make the reference total
      val r = rRows.toDF("rk", "rt", "v0").groupBy("rk", "rt")
        .agg(max("v0").as("v")).repartition(5)
      def toMap(rows: Array[Row]) =
        rows.map(x => x.getLong(0) -> x.get(1)).toMap
      val gotRows = AsofOps.join(l, r, l("k"), r("rk"), l("t"), r("rt"))
        .select("lid", "v").collect()
      // exactly one output row per left row BEFORE the Map collapse —
      // a duplicate-emitting regression would dedupe away inside toMap
      assert(gotRows.length == lRows.size)
      val got = toMap(gotRows)
      val ref = toMap(l.join(r,
          col("k") === col("rk") && col("rt") <= col("t"), "left")
        .withColumn("rn", row_number().over(Window
          .partitionBy("lid").orderBy(desc_nulls_last("rt"))))
        .filter(col("rn") === 1)
        .select("lid", "v").collect())
      assert(got.size == lRows.size && got == ref)
    }
  }

  test("supports int keys and date times (non-long internal encodings)") {
    def d(s: String) = java.sql.Date.valueOf(s)
    val l = Seq((1, d("2024-01-10"), "a"), (1, d("2024-01-02"), "b"))
      .toDF("k", "t", "tag")
    val r = Seq((1, d("2024-01-05"), "m")).toDF("rk", "rt", "v")
    val got = asof(l, r).select("tag", "v").collect()
      .map(x => x.getString(0) -> x.getString(1)).toMap
    assert(got == Map("a" -> "m", "b" -> null))
  }

  test("rejects sides that share output lineage (unaliased self-join)") {
    val d = Seq((1L, 2L)).toDF("k", "t")
    val e = intercept[IllegalArgumentException] {
      AsofOps.join(d, d, d("k"), d("k"), d("t"), d("t"))
    }
    assert(e.getMessage.contains("alias one side"))
  }

  test("plan: strategy fires, both children clustered and sorted") {
    val l = Seq((1L, 10L)).toDF("k", "t")
    val r = Seq((1L, 5L, "m")).toDF("rk", "rt", "v")
    val p = asof(l, r).queryExecution.executedPlan.toString
    // TreeNode.nodeName strips the Exec suffix: the operator prints as
    // "AsofJoin <key>: ..."
    assert(p.contains("AsofJoin "), s"strategy did not fire:\n$p")
    assert(p.linesIterator.count(_.contains("Sort ")) >= 2
        && p.linesIterator.count(_.contains("Exchange hashpartitioning")) >= 2,
      s"children are not clustered + sorted by (key, time):\n$p")
  }

  test("rejects non-integral key/time types up front") {
    val l = Seq(("a", 1L)).toDF("k", "t")
    val r = Seq(("a", 1L, "m")).toDF("rk", "rt", "v")
    intercept[IllegalArgumentException] {
      AsofOps.join(l, r, l("k"), r("rk"), l("t"), r("rt"))
    }
  }

  test("SortedFloorLong: floor semantics on both codegen and eval paths") {
    val arr = Array(10L, 20L, 30L)
    // below-first → null; exact hit → itself; between → lower; above → max
    val keys = Seq(5L, 10L, 15L, 20L, 29L, 30L, 99L)
    val expected = Seq(None, Some(10L), Some(10L), Some(20L), Some(20L),
      Some(30L), Some(30L))
    val df = keys.toDF("key")
      .select(graft.functions.SortedFloorLong.col(col("key"), arr).as("f"))
    // codegen path (whole-stage compiled projection)
    val got = df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(got.toSeq == expected)
    // interpreted eval path (what a codegen fallback would run)
    keys.zip(expected).foreach { case (k, e) =>
      val expr = graft.functions.SortedFloorLong(
        org.apache.spark.sql.catalyst.expressions.Literal(k), arr)
      assert(Option(expr.eval(null)).map(_.asInstanceOf[Long]) == e)
    }
    // null key propagates
    val nullRow = Seq[java.lang.Long](null).toDF("key")
      .select(graft.functions.SortedFloorLong.col(col("key"), arr).as("f"))
      .collect()
    assert(nullRow.head.isNullAt(0))
  }

  test("q_join_asof probes with NO Scala UDF — pure codegen binary search") {
    val p = SparkEntry.queries("q_join_asof")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("ScalaUDF"), s"per-row UDF survived:\n$p")
    assert(p.toLowerCase.contains("sorted_floor_long") ||
      p.contains("SortedFloorLong"), s"floor expression missing:\n$p")
  }
}

package graft

import org.apache.spark.sql.functions._

/** Cross-checks for relational rows whose oracle formulation differs from
  * the Spark implementation (as-of binary search, sessionization), plus
  * set-operation laws (SURVEY.md §5.3).
  */
class RelationalSpec extends SparkSpecBase {

  test("as-of binary search equals brute-force interval join") {
    val got = queries.Relational.qJoinAsof(spark, sf)
    val ev = Tables.events(spark, sf)
    val od = Tables.t(spark, sf, "orders")
      .select(col("o_orderdate").cast("timestamp").as("d")).distinct()
    val brute = ev.join(od, ev("ts") >= od("d"), "left")
      .groupBy("event_id").agg(max("d").as("asof_date"))
      .orderBy("event_id")
    assert(got.except(brute).count() == 0 && brute.except(got).count() == 0)
  }

  test("session durations are non-negative; session count ≤ event count") {
    val s = queries.Events.qEvtSession(spark, sf)
    assert(s.filter(col("dur_sec") < 0).count() == 0)
    assert(s.count() <= Tables.events(spark, sf).count())
    // every event lands in exactly one session
    assert(s.agg(sum("n_events")).head.getLong(0) ==
      Tables.events(spark, sf).count())
  }

  test("set-operation laws on custkey sets") {
    val a = Tables.t(spark, sf, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val b = Tables.t(spark, sf, "customer")
      .filter(col("c_acctbal") > 0).select("c_custkey")
    assert(a.union(a).distinct().count() == a.count())      // A ∪ A = A
    assert(a.intersect(b).except(a).count() == 0)           // A ∩ B ⊆ A
    assert(a.except(b).intersect(b).count() == 0)           // (A∖B) ∩ B = ∅
    val inclExcl = a.union(b).distinct().count() +
      a.intersect(b).count()
    assert(inclExcl == a.count() + b.count())               // |A∪B|+|A∩B|
  }

  test("top-k per group returns ≤ 3 rows per supplier, correctly ranked") {
    val t = queries.Relational.qTopkPerGroup(spark, sf)
    val over = t.groupBy("l_suppkey").count().filter(col("count") > 3)
    assert(over.count() == 0)
  }

  test("weighted sample: keys non-negative, 50 rows, longer-doc bias real") {
    val out = queries.RelationalExtra.qSampleWeighted(spark, sf).collect()
    assert(out.length == 50)
    assert(out.forall(_.getDouble(4) >= 0.0))
    val sampleMean = out.map(_.getLong(2)).sum.toDouble / out.length
    val corpusMean = Tables.t(spark, sf, "documents")
      .agg(org.apache.spark.sql.functions.avg("n_chars")).head().getDouble(0)
    // exponential keys ~ ln(1/u)/w: smaller for larger w, so the 50
    // smallest keys must over-represent long docs vs a uniform draw
    assert(sampleMean > corpusMean)
  }

  test("rollup row count = detail + subtotal + grand-total rows") {
    val r = queries.Relational.qAggRollup(spark, sf)
    val detail = Tables.t(spark, sf, "nation")
      .join(Tables.t(spark, sf, "region"),
        col("n_regionkey") === col("r_regionkey"))
      .select("r_name", "n_name").distinct().count()
    val regions = Tables.t(spark, sf, "region").count()
    assert(r.count() == detail + regions + 1)
  }

  test("Spearman matches a naive tie-averaged rank recompute") {
    val r = queries.RelationalExtra.qCorrSpearman(spark, sf).head
    val (n, sp, pe) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
    val sup = Tables.t(spark, sf, "lineitem")
      .groupBy("l_suppkey")
      .agg(round(sum("l_quantity"), 2).as("x"),
        round(sum("l_extendedprice"), 2).as("y"))
      .collect().map(x => (x.getDouble(1), x.getDouble(2)))
    assert(sup.length.toLong == n)
    def avgRanks(v: Array[Double]): Array[Double] = {
      val byVal = v.sorted.zipWithIndex.groupBy(_._1).map {
        case (x, idx) => x -> idx.map(_._2 + 1.0).sum / idx.length
      }
      v.map(byVal)
    }
    def pearson(a: Array[Double], b: Array[Double]): Double = {
      val (ma, mb) = (a.sum / a.length, b.sum / b.length)
      val cov = a.zip(b).map { case (x, y) => (x - ma) * (y - mb) }.sum
      val (va, vb) = (a.map(x => (x - ma) * (x - ma)).sum,
        b.map(y => (y - mb) * (y - mb)).sum)
      cov / math.sqrt(va * vb)
    }
    val brute = pearson(avgRanks(sup.map(_._1)), avgRanks(sup.map(_._2)))
    assert(math.abs(sp - brute) < 1e-3, s"spearman=$sp vs $brute")
    assert(math.abs(pe - pearson(sup.map(_._1), sup.map(_._2))) < 1e-3)
    // valid correlation range (the synthetic price column is only weakly
    // coupled to quantity, so no strength assumption beyond validity)
    assert(sp >= -1.0 && sp <= 1.0 && pe >= -1.0 && pe <= 1.0)
  }

  test("HHI matches the brute squared-share sum and its bounds") {
    val rows = queries.RelationalExtra.qHhi(spark, sf).collect()
    val bs = Tables.t(spark, sf, "lineitem")
      .join(Tables.t(spark, sf, "part").select("p_partkey", "p_brand"),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "l_suppkey")
      .agg(sum(col("l_quantity").cast("long")).as("q")).collect()
      .map(r => (r.getString(0), r.getLong(2))).groupBy(_._1)
    rows.foreach { r =>
      val qs = bs(r.getString(0)).map(_._2)
      val total = qs.sum
      assert(r.getLong(1) == qs.length && r.getLong(2) == total)
      val brute = qs.map(q => q.toDouble * q).sum / (total.toDouble * total)
      assert(math.abs(r.getDouble(3) - brute) < 1e-5)
      // 1/n ≤ HHI ≤ 1; top share consistent
      assert(r.getDouble(3) >= 1.0 / qs.length - 1e-6 &&
        r.getDouble(3) <= 1.0 + 1e-9)
      assert(r.getLong(4) == qs.max * 1000000L / total)
    }
  }

  test("elasticity matches a closed-form log-log OLS recompute") {
    val rows = queries.RelationalExtra.qElasticity(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum ==
      Tables.t(spark, sf, "lineitem").count())
    val raw = Tables.t(spark, sf, "lineitem")
      .join(Tables.t(spark, sf, "part").select("p_partkey", "p_brand"),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), col("l_quantity"), col("l_extendedprice"))
      .collect()
      .map(r => (r.getString(0), math.log(r.getDouble(1)),
        math.log(r.getDouble(2) / r.getDouble(1))))
      .groupBy(_._1)
    rows.foreach { r =>
      val pts = raw(r.getString(0))
      assert(r.getLong(1) == pts.length)
      val (my, mx) = (pts.map(_._2).sum / pts.length,
        pts.map(_._3).sum / pts.length)
      val sxy = pts.map(p => (p._3 - mx) * (p._2 - my)).sum
      val sxx = pts.map(p => (p._3 - mx) * (p._3 - mx)).sum
      assert(math.abs(r.getDouble(2) - sxy / sxx) < 1e-3,
        s"slope drifts for ${r.getString(0)}")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("Kendall tau-b matches the O(n^2) loop and stays in [-1, 1]") {
    val r = queries.RelationalExtra.qCorrKendall(spark, sf).head
    val bn = Tables.t(spark, sf, "lineitem")
      .join(Tables.t(spark, sf, "supplier")
        .select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_nationkey")
      .agg(sum(col("l_quantity").cast("long")).as("x"),
        round(sum("l_extendedprice"), 2).as("y"))
      .collect().map(x => (x.getLong(1), x.getDouble(2)))
    val n = bn.length
    var (c, d, tx, ty) = (0L, 0L, 0L, 0L)
    for (i <- 0 until n; j <- (i + 1) until n) {
      val sx = java.lang.Long.signum(bn(j)._1 - bn(i)._1)
      val sy = math.signum(bn(j)._2 - bn(i)._2)
      if (sx * sy > 0) c += 1 else if (sx * sy < 0) d += 1
      if (sx == 0) tx += 1
      if (sy == 0) ty += 1
    }
    assert(r.getLong(0) == n.toLong * (n - 1) / 2)
    assert(r.getLong(1) == c && r.getLong(2) == d)
    assert(r.getLong(3) == tx && r.getLong(4) == ty)
    val n0 = n.toLong * (n - 1) / 2
    val tau = (c - d) / math.sqrt((n0 - tx).toDouble * (n0 - ty))
    assert(math.abs(r.getDouble(5) - tau) < 1e-4)
    assert(r.getDouble(5) >= -1.0 && r.getDouble(5) <= 1.0)
  }

  test("price index: base month is exactly 1e6 ppm; Fisher between L and P") {
    val rows = queries.RelationalExtra.qPriceIndex(spark, sf)
      .orderBy("month").collect()
    assert(rows.nonEmpty)
    // the first month IS the base: all three indices identically 10^6
    val base = rows.head
    assert(base.getLong(2) == 1000000L && base.getLong(3) == 1000000L &&
      base.getLong(4) == 1000000L)
    rows.foreach { r =>
      val (l, p, f) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(l > 0 && p > 0)
      // Fisher is the floored geometric mean: between min and max of L, P
      assert(f >= math.min(l, p) - 1 && f <= math.max(l, p))
      assert(f == math.floor(math.sqrt(l.toDouble * p)).toLong)
      // every month prices a full brand panel present in the base month
      assert(r.getLong(1) >= 1L)
    }
  }
}

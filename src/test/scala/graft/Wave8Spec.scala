package graft

import org.apache.spark.sql.functions._

/** Semantics properties of the round-8 §2.19 wave — invariants the
  * DuckDB oracle equality cannot express (cross-operator consistency,
  * algebraic bounds). */
class Wave8Spec extends SparkSpecBase {

  test("skiplist: n_skips = ceil(df / skip_len) and skip_len = ceil(sqrt(df))") {
    queries.SearchRank.qIdxSkiplist(spark, sf).collect().foreach { r =>
      val df = r.getAs[Long]("df")
      val l = r.getAs[Long]("skip_len")
      val n = r.getAs[Long]("n_skips")
      assert(l == math.ceil(math.sqrt(df.toDouble)).toLong)
      assert(n == (df + l - 1) / l, s"term ${r.getAs[String]("term")}")
    }
  }

  test("impact tiers: cum_docs is the running tier sum and ends at the term's df") {
    val rows = queries.SearchRank.qIdxImpact(spark, sf).collect()
      .groupBy(_.getAs[String]("term"))
    rows.foreach { case (_, tiers) =>
      val sorted = tiers.sortBy(-_.getAs[Long]("impact"))
      val runningSums = sorted.scanLeft(0L)(_ + _.getAs[Long]("n_docs")).tail
      assert(sorted.map(_.getAs[Long]("cum_docs")).sameElements(runningSums))
    }
  }

  test("BM25F ranks the title-boosted docs at least as well as plain BM25 top-1") {
    // weighted tf ≥ plain tf for every doc, so the top BM25F score must
    // be ≥ the top single-field BM25 score over the same conjunctive set
    val f = queries.SearchRank.qBm25f(spark, sf).collect()
    val plain = queries.Search.qSearchBm25(spark, sf).collect()
    assert(f.head.getAs[Double]("score") >= plain.head.getAs[Double]("score") - 1e-9)
  }

  test("PL2 and BM25 agree on the conjunctive candidate set") {
    val pl2 = queries.SearchRank.qSearchPl2(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val bm = queries.Search.qSearchBm25(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // both are top-10 of the same {spark, join} conjunctive docs — every
    // returned doc must actually contain BOTH terms, even when the two
    // rankings order them differently
    import org.apache.spark.sql.functions._
    val universe = Tables.docTerms(spark, sf)
      .filter(col("term").isin("spark", "join"))
      .groupBy("doc_id").count().filter(col("count") === 2)
      .collect().map(_.getLong(0)).toSet
    assert(pl2.nonEmpty && bm.nonEmpty)
    assert(pl2.subsetOf(universe),
      s"PL2 returned docs outside the conjunctive set: ${pl2 -- universe}")
    assert(bm.subsetOf(universe),
      s"BM25 returned docs outside the conjunctive set: ${bm -- universe}")
  }

  test("filter cascade: pass counts never exceed n and ordering is by reject_per_cost") {
    val rows = queries.PipelineGov.qFilterCascade(spark, sf).collect()
    assert(rows.length == 4)
    val rpc = rows.map(_.getAs[Long]("reject_per_cost"))
    assert(rpc.sameElements(rpc.sorted.reverse))
    assert(rows.forall(_.getAs[Long]("pass_ppm") <= 1000000L))
  }

  test("fairness parity: best group has parity_ppm exactly 1e6") {
    val rows = queries.PipelineGov.qFairnessParity(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("parity_ppm")).max == 1000000L)
    assert(rows.forall(_.getAs[Long]("parity_ppm") <= 1000000L))
  }

  test("Brier and log loss sit in their algebraic ranges") {
    val b = queries.PipelineGov.qEvalBrier(spark, sf).collect().head
    assert(b.getAs[Long]("brier_e8") >= 0L &&
      b.getAs[Long]("brier_e8") <= 100000000L)
    val l = queries.PipelineGov.qEvalLogloss(spark, sf).collect().head
    assert(l.getAs[Long]("logloss_e6") >= 0L)
  }

  test("PR curve: recall is non-decreasing down the thresholds, ends at 1e6") {
    val rows = queries.PipelineGov.qEvalPrCurve(spark, sf).collect()
    val rec = rows.map(_.getAs[Long]("recall_ppm"))
    assert(rec.zip(rec.tail).forall { case (a, b) => a <= b })
    assert(rec.last == 1000000L)
  }

  test("confusion matrix row shares sum to ~1e6 per cluster; totals match purity") {
    val rows = queries.PipelineGov.qEvalConfusion(spark, sf).collect()
      .groupBy(_.getAs[Long]("cluster"))
    rows.foreach { case (_, rs) =>
      val total = rs.map(_.getAs[Long]("row_ppm")).sum
      // truncating div loses < |labels| ppm per row
      assert(total > 1000000L - rs.length * 10 && total <= 1000000L)
    }
    val purity = queries.PipelineML.qClusterPurity(spark, sf).collect()
      .map(r => r.getAs[Long]("cluster") -> r.getAs[Long]("n_vecs")).toMap
    rows.foreach { case (c, rs) =>
      assert(rs.map(_.getAs[Long]("n")).sum == purity(c))
    }
  }

  test("KMV: estimate is exact when distinct count is under k") {
    queries.PipelineSketch.qKmvDistinct(spark, sf).collect().foreach { r =>
      if (r.getAs[Long]("n_exact") < 64)
        assert(r.getAs[Long]("kmv_est") == r.getAs[Long]("n_exact"))
      else
        assert(r.getAs[Long]("err_ppm") < 500000L,
          s"KMV est off by >50%: $r")
    }
  }

  test("binary embed: Hamming distances are within [0, 64]") {
    val rows = queries.PipelineML.qBinaryEmbed(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val h = r.getAs[Long]("hamming"); h >= 0L && h <= 64L })
  }

  test("degree distribution covers the whole sampled universe") {
    val rows = queries.PipelineGraph.qGraphDegreeDist(spark, sf).collect()
    val totalDocs = rows.map(_.getAs[Long]("n_docs")).sum
    val uni = Tables.t(spark, sf, "documents")
      .filter(col("doc_id") % 10 === 0).count()
    assert(totalDocs == uni)
  }

  test("churn + retention consistency: churned users are absent next week") {
    val rows = queries.EventsPlus.qUserChurn(spark, sf).collect()
    assert(rows.forall(_.getAs[Long]("churn_ppm") <= 1000000L))
    assert(rows.forall(r =>
      r.getAs[Long]("n_churned") <= r.getAs[Long]("n_active")))
  }

  test("percentile series: p50 <= p95 every day") {
    val rows = queries.EventsPlus.qEvtPercentileTs(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r =>
      r.getAs[Long]("p50_cents") <= r.getAs[Long]("p95_cents")))
  }

  test("decompose: total = trend + seasonal + remainder exactly") {
    val rows = queries.EventsPlus.qEvtDecompose(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("total_cents") ==
        r.getAs[Long]("trend_cents") + r.getAs[Long]("seasonal_cents") +
          r.getAs[Long]("remainder_cents"))
    }
  }

  test("nearest join: delta is minimal against a brute-force check") {
    val ev = Tables.events(spark, sf)
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .collect()
    val clicksByUser = ev.filter(_.getAs[String]("event_type") == "click")
      .groupBy(_.getAs[Long]("user_id"))
    val purchases = ev.filter(_.getAs[String]("event_type") == "purchase")
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[Long]("ts_us"))).toList
    val got = queries.EventsPlus.qEvtNearest(spark, sf).collect()
      .map(r => r.getAs[Long]("purchase_id") ->
        Option(r.getAs[java.lang.Long]("delta_us")).map(_.longValue))
      .toMap
    purchases.foreach { case (u, pid, ts) =>
      val clicks = clicksByUser.getOrElse(u, Array.empty)
      val best = clicks.map(c => math.abs(c.getAs[Long]("ts_us") - ts))
        .sorted.headOption
      assert(got(pid) == best, s"purchase $pid")
    }
  }

  test("span mask: masked share is near the designed 20% overall") {
    val agg = queries.PipelineGov.qSpanMask(spark, sf)
      .agg(sum("n_masked").as("m"), sum("n_tok").as("t")).collect().head
    val share = agg.getAs[Long]("m").toDouble / agg.getAs[Long]("t")
    assert(share > 0.15 && share < 0.25, s"mask share $share")
  }

  test("scd3: current state matches the latest event per user") {
    val latest = Tables.events(spark, sf)
      .withColumn("ts_us", unix_micros(col("ts")))
      .orderBy(desc("ts_us"), desc("event_id"))
      .select("user_id", "event_type").collect()
      .groupBy(_.getAs[Long]("user_id")).map { case (u, rs) =>
        u -> rs.head.getAs[String]("event_type") }
    queries.Warehouse.qScd3(spark, sf).collect().foreach { r =>
      assert(r.getAs[String]("state") ==
        latest(r.getAs[Long]("user_id")))
    }
  }

  test("bootstrap CI brackets the full-sample mean") {
    val r = queries.PipelineAudit.qStatsBootstrap(spark, sf).collect().head
    assert(r.getAs[Long]("boot_lo_cents") <= r.getAs[Long]("boot_hi_cents"))
    // the full mean should sit within (or at worst near) the CI
    val m = r.getAs[Long]("mean_cents")
    assert(m >= r.getAs[Long]("boot_lo_cents") - 1000 &&
      m <= r.getAs[Long]("boot_hi_cents") + 1000)
  }

  // ───────────── batch G properties ─────────────

  test("ccnet buckets: partition the corpus, terciles within 1 grid cell of n/3") {
    val rows = queries.PipelineGov.qCcnetBuckets(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    val nDocs = Tables.t(spark, sf, "documents").count()
    assert(total == nDocs)
    val byB = rows.map(r => r.getAs[String]("bucket") ->
      r.getAs[Long]("n_docs")).toMap
    // grid-resolution terciles: head gets AT LEAST a third (ties at the
    // threshold cell spill into head/middle, never tail-ward)
    assert(byB("head") >= nDocs / 3 - 1, s"head ${byB("head")} of $nDocs")
    // buckets are ordered: every head mean <= every middle mean <= tail
    val hi = rows.map(r => r.getAs[String]("bucket") ->
      r.getAs[Long]("hi_e6")).toMap
    val lo = rows.map(r => r.getAs[String]("bucket") ->
      r.getAs[Long]("lo_e6")).toMap
    assert(hi("head") <= lo("middle") + 10000 &&
      hi("middle") <= lo("tail") + 10000)
  }

  test("mrl: full-dim overlap is exactly 10 and overlap grows with d") {
    val rows = queries.PipelineML.qEmbedMrl(spark, sf).collect()
      .groupBy(_.getAs[Long]("qid"))
    rows.foreach { case (_, rs) =>
      val byD = rs.map(r => r.getAs[Long]("d") ->
        r.getAs[Long]("n_hit")).toMap
      assert(byD(64L) == 10L)
      // monotone up to absent rows (n_hit=0 rows are simply missing)
      assert(byD.getOrElse(16L, 0L) <= byD.getOrElse(32L, 10L) ||
        byD.getOrElse(32L, 0L) <= 10L)
    }
  }

  test("permutation test: p-value in (0, 1] ppm and perms counted") {
    val r = queries.PipelineAudit.qStatsPermutation(spark, sf)
      .collect().head
    assert(r.getAs[Long]("n_perms") == 30L)
    val p = r.getAs[Long]("p_ppm")
    assert(p > 0L && p <= 1000000L)
  }

  test("hill: alpha positive and xk1 is the 101st-largest order value") {
    val r = queries.PipelineAudit.qHillTail(spark, sf).collect().head
    assert(r.getAs[Long]("k") == 100L)
    assert(r.getAs[Long]("alpha_e3") > 0L)
    val cents = Tables.t(spark, sf, "orders")
      .select(expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("c"))
      .orderBy(desc("c")).limit(101).collect().map(_.getLong(0))
    assert(r.getAs[Long]("xk1_cents") == cents.last)
  }
}

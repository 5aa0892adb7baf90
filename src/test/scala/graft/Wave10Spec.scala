package graft

import org.apache.spark.sql.functions._

/** Semantics properties of the round-10 §2.21 wave — the invariants the
  * DuckDB oracle equality cannot express: genuine early convergence
  * (not a silent run-to-the-cap), sketch error bounds against the exact
  * order statistic, and cross-operator consistency. */
class Wave10Spec extends SparkSpecBase {

  test("pagerank_converge: loop exits well before the 30-hop bound; pr mass sane") {
    val (df, hops) = queries.PipelineGraph.pagerankConvergeWithHops(spark, sf)
    assert(hops > 0 && hops < 30,
      s"convergence loop did not exit early: $hops hops")
    val rows = df.collect()
    val n = rows.length
    // every node holds at least the teleport term t0, and the total
    // mass cannot exceed the full (1-d)-series bound 10^9
    val t0 = 500000000L / n
    assert(rows.forall(_.getAs[Long]("pr_e9") >= t0))
    assert(rows.map(_.getAs[Long]("pr_e9")).sum <= 1000000000L)
  }

  test("pagerank_converge: running MORE hops changes nothing (true fixpoint)") {
    // the loop exits when the term vector is exactly zero; re-running
    // the whole operator must reproduce the same relation bit-for-bit
    val a = queries.PipelineGraph.qPagerankConverge(spark, sf).collect()
    val b = queries.PipelineGraph.qPagerankConverge(spark, sf).collect()
    assert(a.toSeq == b.toSeq)
  }

  test("hits_converge: reaches the EXACT integer fixpoint within the cap") {
    val (df, iters, fixed) =
      queries.PipelineGraph.hitsConvergeWithIters(spark, sf)
    assert(fixed, s"no fixpoint within $iters rounds — cap must be raised")
    val rows = df.collect()
    assert(rows.length == 10)
    // renormalized authorities live on the [0, 10^6] grid with the
    // argmax part pinned at exactly 10^6
    assert(rows.head.getAs[Long]("authority_e6") == 1000000L)
    assert(rows.forall(r => {
      val a = r.getAs[Long]("authority_e6"); a >= 0L && a <= 1000000L
    }))
  }

  test("pct_sketch_union: estimate within one bin of the exact order statistic") {
    val est = queries.PipelineSketch.qPctSketchUnion(spark, sf).collect()
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("month").orderBy("cents")
    val exact = Tables.t(spark, sf, "orders")
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        expr("cast(round(o_totalprice * 100) as bigint)").as("cents"))
      .withColumn("rk", row_number().over(w))
      .collect()
      .groupBy(_.getString(0))
      .map { case (m, rs) =>
        m -> rs.sortBy(_.getAs[Int]("rk")).map(_.getAs[Long]("cents"))
      }
    est.foreach { r =>
      val m = r.getString(0)
      val sorted = exact(m)
      val n = sorted.length
      assert(r.getAs[Long]("n") == n, s"month $m n")
      def check(q: Long, d: Long, col: String): Unit = {
        val k = ((n * q + d - 1) / d).toInt // ceil(q*n/d)
        val kth = sorted(k - 1) // cents
        val floor = r.getAs[Long](col) * 100 // dollars -> cents
        assert(floor <= kth && kth < floor + 500000,
          s"month $m $col: floor=$floor kth=$kth")
      }
      check(1, 2, "p50_floor")
      check(9, 10, "p90_floor")
      check(99, 100, "p99_floor")
    }
  }

  test("pct_sketch_union: month sketch IS the merge of its day sketches") {
    // recompute the month histogram directly (no day level) and check
    // the merged counters agree — the mergeability contract
    val direct = Tables.t(spark, sf, "orders")
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        expr("cast(round(o_totalprice * 100) as bigint) div 500000")
          .as("bin"))
      .groupBy("month", "bin").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val viaDays = Tables.t(spark, sf, "orders")
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        to_date(col("o_orderdate")).as("d"),
        expr("cast(round(o_totalprice * 100) as bigint) div 500000")
          .as("bin"))
      .groupBy("month", "d", "bin").agg(count(lit(1)).as("cnt"))
      .groupBy("month", "bin").agg(sum("cnt").as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(direct == viaDays)
  }

  test("kmeans_steps: k clusters at most, sizes cover the corpus exactly") {
    val rows = queries.PipelineML.qKmeansSteps(spark, sf).collect()
    val nVec = Tables.t(spark, sf, "embeddings").count()
    val k = math.max(3L, nVec / 256L)
    assert(rows.length <= k && rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n")).sum == nVec)
    // cluster ids are seed vec_ids — all below k
    assert(rows.forall(_.getAs[Long]("cluster") < k))
  }

  test("logreg_gd3: step-1 weights agree with the single-step operator's grid") {
    // gd3's step 1 is w1_e6 = -round(gsum/(2n)); qLogregGd publishes
    // w1 = round(-gsum/(2e6*n), 6) — the same rational on the same
    // micro grid, so the two must agree to the last unit
    val gd = queries.PipelineTrain.qLogregGd(spark, sf).collect()
      .map(r => r.getAs[Long]("dim") ->
        (r.getAs[Long]("gsum"), r.getAs[Long]("n"))).toMap
    gd.foreach { case (dim, (gsum, n)) =>
      val w1e6 = -math.round(gsum.toDouble / (2.0 * n))
      val viaGd = math.round(
        math.rint(-gsum.toDouble / (2e6 * n) * 1e6)) // round(…,6)·1e6
      assert(math.abs(w1e6 - viaGd) <= 1, s"dim $dim: $w1e6 vs $viaGd")
    }
    val w3 = queries.PipelineTrain.qLogregGd3(spark, sf).collect()
    assert(w3.length == 8)
    assert(w3.forall(r => math.abs(r.getAs[Long]("w3_e6")) < 10000000L),
      "weights exploded — lr too hot for the exact grid")
  }

  test("community_lpa: converges to an exact fixpoint within the cap") {
    val (df, iters, fixed) =
      queries.PipelineGraph.communityLpaWithIters(spark, sf)
    assert(fixed, s"no LPA fixpoint within $iters rounds")
    assert(iters <= 5)
    val rows = df.collect()
    // labels stay in the seed domain and community sizes tile the sample
    assert(rows.forall(r => {
      val c = r.getAs[Long]("community"); c >= 0 && c < 16
    }))
    val n = Tables.t(spark, sf, "documents")
      .filter(col("doc_id") % 10 === 0).count()
    assert(rows.length == n)
  }

  test("search_hybrid: fused ranking rewards two-arm agreement") {
    val rows = queries.SearchRank.qSearchHybrid(spark, sf).collect()
    assert(rows.length == 10)
    // every fused score decomposes into the two arms' exact terms
    rows.foreach { r =>
      val l = Option(r.getAs[Any]("lrank")).map(_.asInstanceOf[Long])
      val s = Option(r.getAs[Any]("srank")).map(_.asInstanceOf[Long])
      val expect = l.map(x => 1000000000L / (60 + x)).getOrElse(0L) +
        s.map(x => 1000000000L / (60 + x)).getOrElse(0L)
      assert(r.getAs[Long]("rrf_e9") == expect)
      assert(l.nonEmpty || s.nonEmpty)
    }
    // a doc ranked by BOTH arms must outscore any single-arm doc whose
    // one rank is not better than both of its ranks — spot-check the
    // invariant that fusion actually adds the arms rather than maxing
    val both = rows.filter(r => r.getAs[Any]("lrank") != null &&
      r.getAs[Any]("srank") != null)
    if (both.nonEmpty) {
      val worstBoth = both.map(_.getAs[Long]("rrf_e9")).min
      assert(worstBoth > 1000000000L / (60 + 1) - 1000000000L / 81,
        "two-arm scores should clear the single-arm ceiling region")
    }
  }

  test("mix_epochs: planner arithmetic is consistent and the cap binds correctly") {
    val rows = queries.PipelineTrain.qMixEpochs(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val tokens = r.getAs[Long]("tokens")
      val alloc = r.getAs[Long]("alloc")
      val em = r.getAs[Long]("epochs_milli")
      val planned = r.getAs[Long]("planned_tokens")
      assert(em <= 4000L && em >= 0L)
      assert(planned == tokens * em / 1000)
      // uncapped sources fill their allocation to within one source pass
      if (em < 4000L) assert(planned <= alloc && alloc - planned < tokens)
      assert(r.getAs[Boolean]("starved") == (planned < alloc))
    }
  }

  test("stream outer join: outer rows actually emit; matched+unmatched=n_rows") {
    val rows = graft.streaming.Streams.sStreamOuterJoin(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("n_matched") +
      r.getAs[Long]("n_unmatched") == r.getAs[Long]("n_rows")))
    // the whole point of the OUTER variant: null-padded unmatched views
    // must appear after the watermark passes — at least one user has one
    assert(rows.map(_.getAs[Long]("n_unmatched")).sum > 0,
      "no unmatched views emitted — the outer path never fired")
  }
}

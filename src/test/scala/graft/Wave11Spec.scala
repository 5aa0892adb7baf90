package graft

import org.apache.spark.sql.functions._

/** Property tests for the round-11 §2.22 wave — each operator's defining
  * invariant, beyond the row-level oracle equality the driver checks.
  */
class Wave11Spec extends SparkSpecBase {

  test("q_kmv_union: merged sketch equals the sketch built on the corpus") {
    // min-k(∪ min-k(S_i)) = min-k(∪ S_i): the estimate from the merged
    // per-source sketches must equal the estimate a direct corpus
    // sketch yields — the property that makes the rollup trustworthy.
    val allRow = SparkEntry.queries("q_kmv_union")(spark, sf)
      .filter(col("scope") === "ALL").collect().head
    val direct = Tables.t(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("term")).distinct()
      .withColumn("h", Tables.md5Bucket(col("term")))
      .orderBy("h").limit(64)
      .agg(count(lit(1)).as("n_kept"), max("h").as("kth"))
      .collect().head
    val (nKept, kth) = (direct.getLong(0), direct.getLong(1))
    val exact = allRow.getLong(allRow.fieldIndex("n_exact"))
    val est = allRow.getLong(allRow.fieldIndex("kmv_est"))
    val directEst =
      if (nKept < 64) exact
      else ((BigInt(63) * BigInt(2).pow(60)) / BigInt(kth)).toLong
    assert(est == directEst,
      s"merge-of-sketches ($est) != sketch-of-union ($directEst)")
    // and the estimate is a real estimate: within 50% of truth at k=64
    assert(math.abs(est - exact) * 2 <= exact,
      s"KMV estimate $est too far from exact $exact")
  }

  test("q_fuzzy_deletion returns exactly q_search_fuzzy's answer") {
    // the deletion-neighborhood index is an INDEX, not a new semantic:
    // its candidate-join + verify must reproduce the full-scan result
    val idx = SparkEntry.queries("q_fuzzy_deletion")(spark, sf)
      .collect().toSeq
    val scan = SparkEntry.queries("q_search_fuzzy")(spark, sf)
      .collect().toSeq
    assert(idx == scan,
      s"index answer ${idx.mkString(",")} != scan answer ${scan.mkString(",")}")
  }

  test("q_mix_temperature: exact isqrt grid and ppm bookkeeping") {
    val rows = SparkEntry.queries("q_mix_temperature")(spark, sf).collect()
    val isqrts = rows.map(r => (r.getLong(r.fieldIndex("tokens")),
      r.getLong(r.fieldIndex("isqrt"))))
    isqrts.foreach { case (n, s) =>
      assert(s * s <= n && (s + 1) * (s + 1) > n,
        s"isqrt($n) = $s is not the exact integer square root")
    }
    // weights sum to 10^6 minus only truncation slack (< |sources|)
    val wSum = rows.map(_.getLong(rows.head.fieldIndex("weight_ppm"))).sum
    assert(wSum <= 1000000L && wSum > 1000000L - rows.length,
      s"weight_ppm sum $wSum outside (1e6 - n_sources, 1e6]")
    // temperature flattens: the weight RATIO between the largest and
    // smallest source is the sqrt of their token ratio (on the grid).
    // Tolerance is the PROVABLE truncation bound, not a magic 1.01
    // (round-11 advice): isqrt(x) > sqrt(x) − 1 gives
    // isqrt(max)/isqrt(min) < sqrt(max/min) · 1/(1 − 1/sqrt(min)), and
    // sqrt(min) ≥ isqrt(min) = minT._2 — so the test cannot flake on
    // regenerated data with smaller sources.
    val maxT = isqrts.maxBy(_._1)
    val minT = isqrts.minBy(_._1)
    assert(minT._2 >= 2, s"degenerate source: isqrt=${minT._2}")
    assert(maxT._2.toDouble / minT._2 <=
      math.sqrt(maxT._1.toDouble / minT._1) / (1.0 - 1.0 / minT._2),
      "T=2 scaling did not flatten the source ratio")
  }

  test("integral division truncates toward zero identically on both engines") {
    // q_cluster_silhouette's s_ppm can go NEGATIVE (b2 < a2 for a
    // misclassified vector); its oracle parity rests on Spark `div`
    // and DuckDB `//` agreeing there. DuckDB -7 // 2 = -3 was verified
    // by hand (truncation, not floor); pin Spark's side — both the
    // long and the DECIMAL(38,0) path the ppm expressions use.
    val r = spark.sql(
      """SELECT -7L div 2L AS a,
        |  CAST(CAST(-7 AS DECIMAL(38,0)) * 1 div 2 AS BIGINT) AS b"""
        .stripMargin).collect().head
    assert(r.getLong(0) == -3L, s"long div: ${r.getLong(0)}")
    assert(r.getLong(1) == -3L, s"decimal div: ${r.getLong(1)}")
  }

  test("q_cluster_silhouette: label clusters mostly separate; counts consistent") {
    val rows = SparkEntry.queries("q_cluster_silhouette")(spark, sf)
      .collect()
    assert(rows.length == 10, s"expected 10 label rows, got ${rows.length}")
    val n = rows.map(_.getLong(1)).sum
    assert(n == 500, s"silhouette rows cover $n vectors, expected 500")
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_separated")) <= r.getLong(1))
    }
  }

  test("q_eval_prf: bookkeeping identities hold") {
    val rows = SparkEntry.queries("q_eval_prf")(spark, sf).collect()
    val nTrue = rows.map(_.getLong(rows.head.fieldIndex("n_true"))).sum
    val nPred = rows.map(_.getLong(rows.head.fieldIndex("n_pred"))).sum
    assert(nTrue == nPred, s"sum n_true $nTrue != sum n_pred $nPred")
    rows.foreach { r =>
      val tp = r.getLong(r.fieldIndex("tp"))
      assert(tp <= r.getLong(r.fieldIndex("n_true")) &&
        tp <= r.getLong(r.fieldIndex("n_pred")))
      val f1 = r.getLong(r.fieldIndex("f1_ppm"))
      assert(f1 >= 0 && f1 <= 1000000L)
    }
  }

  test("q_dedup_minhash_w: weighted Jaccard bounded and expansion exact") {
    val rows = SparkEntry.queries("q_dedup_minhash_w")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ppm = r.getLong(r.fieldIndex("wjacc_ppm"))
      assert(ppm >= 0 && ppm <= 1000000L, s"wjacc_ppm $ppm out of range")
    }
    // the estimate column stays on the 1/8 grid
    rows.foreach { r =>
      val est = r.getDouble(r.fieldIndex("est"))
      assert((est * 8).isWhole, s"est $est not a multiple of 1/8")
    }
  }

  test("q_dedup_winnow: ordered pairs sharing at least 2 fingerprints") {
    val rows = SparkEntry.queries("q_dedup_winnow")(spark, sf).collect()
    assert(rows.nonEmpty, "corpus has near-dup docs; winnow pairs expected")
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "pairs must be d1 < d2")
      assert(r.getLong(r.fieldIndex("shared")) >= 2)
    }
  }

  test("q_split_leakage: pair totals reconcile with the edge stream") {
    val rows = SparkEntry.queries("q_split_leakage")(spark, sf).collect()
    val total = rows.map(_.getLong(rows.head.fieldIndex("n_pairs"))).sum
    val edges = queries.PipelinePlus.minhashPairs(spark, sf)
      .filter(col("est_jaccard") >= 0.875).count()
    assert(total == edges,
      s"leakage rows cover $total pairs, edge stream has $edges")
    rows.foreach { r =>
      val a = r.getString(r.fieldIndex("split_a"))
      val b = r.getString(r.fieldIndex("split_b"))
      assert(a <= b, "split pair not canonicalized")
      assert(r.getBoolean(r.fieldIndex("leaky")) == (a != b))
    }
  }
}

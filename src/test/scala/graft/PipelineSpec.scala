package graft

import org.apache.spark.sql.functions._

/** Invariants for the LLM-pipeline operators (SURVEY.md §2.10, §5.3). */
class PipelineSpec extends SparkSpecBase {

  test("exact dedup is idempotent and keeps ≤ input rows") {
    val docs = Tables.t(spark, sf, "documents")
    val once = queries.Pipeline.qDedupExact(spark, sf)
    assert(once.count() <= docs.count())
    // one survivor per distinct content hash
    assert(once.select("h").distinct().count() == once.count())
    assert(once.count() ==
      docs.select(md5(col("text"))).distinct().count())
  }

  test("near-dup jaccard is in (0, 1] and pairs are ordered d1 < d2") {
    val pairs = queries.Pipeline.qDedupNear(spark, sf)
    val bad = pairs.filter(
      col("jaccard") <= 0.0 || col("jaccard") > 1.0 ||
        col("d1") >= col("d2")).count()
    assert(bad == 0)
  }

  test("cosine similarity is within [-1, 1] and descending") {
    val top = queries.Pipeline.qSimCosineTopk(spark, sf).collect()
    assert(top.nonEmpty)
    val sims = top.map(r => r.getDouble(r.fieldIndex("cos")))
    assert(sims.forall(s => s >= -1.0001 && s <= 1.0001))
    assert(sims.sameElements(sims.sorted.reverse))
  }

  test("centroids: one row per (label, position), all 64 positions") {
    val c = queries.Pipeline.qSimCentroids(spark, sf)
    val labels = Tables.t(spark, sf, "embeddings")
      .select("label").distinct().count()
    assert(c.count() == labels * 64)
  }

  test("feature hashing: dims bounded, norms consistent, every doc featurized") {
    val out = queries.PipelineML.qFeatureHash(spark, sf).collect()
    assert(out.length == Tables.t(spark, sf, "documents").count())
    assert(out.forall(r => r.getLong(1) >= 1L && r.getLong(1) <= 64L)) // nnz
    assert(out.forall(r => r.getLong(3) >= 0L && r.getLong(3) < 64L))  // top_dim
    // sq_norm >= top_cnt^2 and top_cnt >= any other dim's count by definition
    assert(out.forall(r => r.getLong(2) >= r.getLong(4) * r.getLong(4)))
  }

  test("lang distribution percentages sum to ~100 per corpus") {
    val dist = queries.Pipeline.qTextLangDist(spark, sf)
    val total = dist.agg(sum("n")).head.getLong(0)
    assert(total == Tables.t(spark, sf, "documents").count())
  }

  test("bigram count == tokens − docs (one bigram per adjacent pair)") {
    val allBigrams = Tables.t(spark, sf, "documents")
      .select(split(col("text"), " ").as("arr"))
      .select((size(col("arr")) - 1).as("nb"))
      .agg(sum("nb")).head.getLong(0)
    val tokens = Tables.tokens(spark, sf).count()
    val docs = Tables.t(spark, sf, "documents").count()
    assert(allBigrams == tokens - docs)
  }

  test("eval AUC: counts partition the table, AUC separates label 1") {
    val r = queries.PipelineML.qEvalAuc(spark, sf).head
    val total = Tables.t(spark, sf, "embeddings").count()
    val nPos = Tables.t(spark, sf, "embeddings")
      .filter(col("label") === 1).count()
    assert(r.getLong(0) == nPos && r.getLong(0) + r.getLong(1) == total)
    val auc = r.getDouble(2)
    // a centroid scorer must beat chance on its own class, and the
    // rank-sum identity caps AUC at exactly 1
    assert(auc > 0.5 && auc <= 1.0, s"auc=$auc")
  }

  test("embed quant: reconstruction error bounded by half a code step") {
    val rows = queries.PipelineML.qEmbedQuant(spark, sf).collect()
    val total = Tables.t(spark, sf, "embeddings").count()
    assert(rows.map(_.getLong(1)).sum == total)        // vecs partition
    assert(rows.forall(r => r.getLong(2) == r.getLong(1) * 64))
    // widest per-dim range bounds the worst reconstruction error:
    // |v - vhat| ≤ (mx - mn) / 255 / 2 for every value
    val widest = Tables.t(spark, sf, "embeddings")
      .select(posexplode(col("embedding")))
      .groupBy("pos")
      .agg((max(col("col").cast("double")) -
        min(col("col").cast("double"))).as("rng"))
      .agg(max("rng")).head.getDouble(0)
    val bound = widest / 255.0 / 2.0 * 1e3 + 1e-9
    assert(rows.forall(_.getDouble(4) <= bound),
      s"maxerr_e3 above half-step bound $bound")
    assert(rows.forall(r => r.getDouble(3) >= 0 && r.getDouble(4) >= 0))
  }

  test("eval calibration: bins partition the table, ece = weighted gap mean") {
    val rows = queries.PipelineML.qEvalCalibration(spark, sf).collect()
    val total = Tables.t(spark, sf, "embeddings").count()
    assert(rows.map(_.getLong(1)).sum == total)
    assert(rows.forall { r =>
      val (bin, conf, acc, gap) =
        (r.getLong(0), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      bin >= 0 && bin <= 9 &&
        conf >= 0.0 && conf <= 1.0 && acc >= 0.0 && acc <= 1.0 &&
        // gap is |conf − acc| re-rounded; the two inputs are themselves
        // round(4) projections of the same exact rationals
        math.abs(gap - math.abs(conf - acc)) < 2e-4
    })
    val ece = rows.head.getDouble(5)
    assert(rows.forall(_.getDouble(5) == ece), "ece must be constant")
    val recomputed = rows.map(r => r.getLong(1) * r.getDouble(4)).sum /
      rows.map(_.getLong(1)).sum
    assert(math.abs(ece - recomputed) < 2e-4, s"ece=$ece vs $recomputed")
    assert(ece >= 0.0 && ece <= 1.0)
  }

  test("cluster purity: clusters partition the table, majority is majority") {
    val rows = queries.PipelineML.qClusterPurity(spark, sf).collect()
    val total = Tables.t(spark, sf, "embeddings").count()
    assert(rows.map(_.getLong(1)).sum == total)
    rows.foreach { r =>
      val (n, topN, purity) = (r.getLong(1), r.getLong(3), r.getDouble(4))
      assert(topN >= 1 && topN <= n)
      // majority of a 10-label space is at least n/10 rounded down
      assert(topN * 10 >= n, s"top_n=$topN can't be the majority of $n")
      assert(math.abs(purity - topN.toDouble / n) < 1e-4)
      assert(purity > 0.0 && purity <= 1.0)
    }
  }

  test("dup families: histogram partitions the corpus, shares ≤ 1e6") {
    val rows = queries.Pipeline.qDupFamilies(spark, sf).collect()
    val total = Tables.t(spark, sf, "documents").count()
    assert(rows.map(_.getLong(2)).sum == total, "n_docs must partition")
    // families × size = docs per row; unique docs are the size-1 row
    rows.foreach { r =>
      assert(r.getLong(2) == r.getLong(0) * r.getLong(1))
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 1000000L)
    }
    // consistency with q_dedup_exact: families = kept (deduped) docs
    val kept = queries.Pipeline.qDedupExact(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == kept)
  }

  test("eval F1: confusion partitions the table, F1 is the harmonic mean") {
    val r = queries.PipelineML.qEvalF1(spark, sf).head
    val (tp, fp, fn, tn) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(tp + fp + fn + tn ==
      Tables.t(spark, sf, "embeddings").count())
    def r4(x: Double): Double = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val (p, rec) = (tp.toDouble / (tp + fp), tp.toDouble / (tp + fn))
    assert(math.abs(r.getDouble(4) - r4(p)) < 1e-9)
    assert(math.abs(r.getDouble(5) - r4(rec)) < 1e-9)
    assert(math.abs(r.getDouble(6) - r4(2.0 * tp / (2 * tp + fp + fn)))
      < 1e-9)
    // F1 lies between precision and recall (harmonic-mean bound)
    val f1 = r.getDouble(6)
    assert(f1 <= math.max(p, rec) + 1e-4 && f1 >= 0.0 && f1 <= 1.0)
    // the same classifier's confusion must agree with q_eval_auc's label
    // partition
    val auc = queries.PipelineML.qEvalAuc(spark, sf).head
    assert(tp + fn == auc.getLong(0) && fp + tn == auc.getLong(1))
  }
}

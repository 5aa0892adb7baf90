package graft

import org.apache.spark.sql.functions._

/** Properties of the third-wave text-curation operators that the DuckDB
  * oracle can't express (invariants, not values).
  */
class PipelineTextSpec extends SparkSpecBase {

  private lazy val nDocs = Tables.t(spark, sf, "documents").count()

  test("normalize: round-trips the dirtied text, never grows it") {
    val df = queries.PipelineText.qTextNormalize(spark, sf)
    assert(df.count() == nDocs)
    assert(df.filter(!col("roundtrip_ok")).count() == 0)
    assert(df.filter(col("n_norm") > col("n_raw")).count() == 0)
  }

  test("repetition: ratios bounded, one row per document") {
    val df = queries.PipelineText.qRepetitionFilter(spark, sf)
    assert(df.count() == nDocs)
    assert(df.filter(col("top_share") <= 0 || col("top_share") > 1).count() == 0)
    assert(df.filter(col("dup_ratio") < 0 || col("dup_ratio") >= 1).count() == 0)
    // top_share can never be below 1/n_tok
    assert(df.filter(col("top_share") * col("n_tok") < 0.999).count() == 0)
  }

  test("stratified sample: per-stratum counts consistent, rates honored") {
    val rows = queries.PipelineText.qSampleStratified(spark, sf).collect()
    assert(rows.map(_.getLong(rows.head.fieldIndex("n_total"))).sum == nDocs)
    rows.foreach { r =>
      val total = r.getLong(r.fieldIndex("n_total"))
      val sampled = r.getLong(r.fieldIndex("n_sampled"))
      assert(sampled >= 0 && sampled <= total)
      val pct = r.getDouble(r.fieldIndex("pct"))
      assert(pct >= 0.0 && pct <= 100.0)
    }
  }

  test("quantile filter: survivors sit inside [p10, p90]") {
    val df = queries.PipelineText.qQuantileFilter(spark, sf)
    assert(df.filter(
      col("n_chars") < col("p10") || col("n_chars") > col("p90")).count() == 0)
    val kept = df.count().toDouble / nDocs
    assert(kept >= 0.5 && kept <= 0.95, s"kept fraction $kept out of band")
  }

  test("vocab: ranks contiguous, tf non-increasing, coverage monotone") {
    val rows = queries.PipelineText.qTokVocab(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 100)
    assert(rows.map(_.getLong(rows.head.fieldIndex("rank"))).toSeq ==
      (1L to rows.length))
    val tfs = rows.map(_.getLong(rows.head.fieldIndex("tf")))
    assert(tfs.sameElements(tfs.sortBy(-_)), "tf not non-increasing")
    assert(tfs.forall(_ >= 5))
    val shares = rows.map(_.getDouble(rows.head.fieldIndex("cum_share")))
    assert(shares.zip(shares.tail).forall { case (a, b) => b >= a })
    assert(shares.last <= 1.0001)
  }

  test("tokenizer fertility: languages partition the corpus, ratios bounded") {
    val rows = queries.PipelineText.qTokFertility(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum == nDocs)
    rows.foreach { r =>
      val fert = r.getDouble(4)
      val cpt = r.getDouble(6)
      // ≥ 1e6: a 4-char-per-token estimate can't shrink below one token
      // per word on a space-separated corpus (every word ≥ 1 char)
      assert(fert >= 1e6 * 0.5 && fert <= 4e6, s"fert_ppm=$fert")
      // chars/token ≤ 4 exactly (bpe = ceil(chars/4)); ≥ 3.5 because
      // every doc here is ≥ 100 chars so the ceil slack is ≤ 1/25
      assert(cpt <= 4e6 && cpt > 3.5e6, s"cpt_ppm=$cpt")
      assert(r.getDouble(5) > 0, "regex tokens vanished")
    }
  }

  test("vocab overlap: symmetric pair grid, jaccard consistent with sizes") {
    val rows = queries.PipelineText.qVocabOverlap(spark, sf).collect()
    val nLangs = Tables.t(spark, sf, "documents")
      .select("lang").distinct().count()
    assert(rows.length == nLangs * (nLangs - 1) / 2, "missing lang pairs")
    rows.foreach { r =>
      val (s1, s2, inter, j) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(inter <= math.min(s1, s2))
      assert(math.abs(j - inter.toDouble / (s1 + s2 - inter)) < 1e-4)
      assert(j >= 0.0 && j <= 1.0)
      assert(r.getString(0) < r.getString(1), "pair not ordered l1 < l2")
    }
  }

  test("source-mix KL: non-negative, zero iff the source matches the mix") {
    val rows = queries.PipelineCurate.qSourceMixKl(spark, sf).collect()
    val total = Tables.t(spark, sf, "documents").count()
    assert(rows.map(_.getLong(1)).sum == total)
    rows.foreach { r =>
      // Gibbs: KL ≥ 0 over the exact count ratios (round(4) can shave
      // at most 5e-5 below zero)
      assert(r.getDouble(3) >= -1e-4, s"KL < 0 for ${r.getString(0)}")
      assert(r.getLong(2) >= 1 && r.getLong(2) <= 5)
    }
    // at least one source diverges on this synthetic mix
    assert(rows.exists(_.getDouble(3) > 0.0))
  }

  test("hapax profile matches a naive per-source recount") {
    val rows = queries.PipelineText.qTextHapax(spark, sf).collect()
    val docs = Tables.t(spark, sf, "documents")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val bySource = docs.groupBy(_._1).map { case (s, ds) =>
      val tf = ds.flatMap(_._2.split(" ", -1))
        .groupBy(identity).map { case (_, v) => v.length }
      s -> (tf.map(_.toLong).sum, tf.size.toLong,
        tf.count(_ == 1).toLong)
    }
    assert(rows.map(_.getString(0)).toSeq == rows.map(_.getString(0))
      .toSeq.sorted)
    assert(rows.length == bySource.size)
    rows.foreach { r =>
      val (nTok, vocab, hapax) = bySource(r.getString(0))
      assert(r.getLong(1) == nTok && r.getLong(2) == vocab &&
        r.getLong(3) == hapax, s"counts drift for ${r.getString(0)}")
      assert(r.getLong(4) == vocab * 1000000L / nTok)
      assert(r.getLong(5) == hapax * 1000000L / vocab)
      // orderings every corpus obeys
      assert(hapax <= vocab && vocab <= nTok)
    }
  }
}

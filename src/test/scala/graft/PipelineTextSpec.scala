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

  test("JSD matches brute force, is bounded by ln 2, covers all pairs") {
    val rows = queries.PipelineText.qTextJsd(spark, sf).collect()
    val counts = Tables.t(spark, sf, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("term"))
      .groupBy("source", "term").agg(count(lit(1)).as("c")).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val sources = counts.keys.map(_._1).toSeq.distinct.sorted
    val vocab = counts.keys.map(_._2).toSeq.distinct
    assert(rows.length == sources.length * (sources.length - 1) / 2)
    val totals = sources.map(s =>
      s -> counts.filter(_._1._1 == s).values.sum).toMap
    rows.foreach { r =>
      val (s1, s2) = (r.getString(0), r.getString(1))
      assert(s1 < s2)
      val (n1, n2) = (totals(s1).toDouble, totals(s2).toDouble)
      val brute = vocab.map { t =>
        val p = counts.getOrElse((s1, t), 0L) / n1
        val q = counts.getOrElse((s2, t), 0L) / n2
        val m = (p + q) / 2
        (if (p > 0) p * math.log(p / m) else 0.0) / 2 +
          (if (q > 0) q * math.log(q / m) else 0.0) / 2
      }.sum
      assert(math.abs(r.getDouble(2) - brute) < 1e-3,
        s"jsd drifts for ($s1,$s2)")
      assert(r.getDouble(2) >= -1e-9 &&
        r.getDouble(2) <= math.log(2.0) + 1e-4)
      assert(r.getLong(3) <= vocab.length)
    }
  }

  test("burstiness matches a naive per-term VMR recompute") {
    val rows = queries.PipelineText.qTextBurstiness(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    // deterministic (df desc, term) order
    val keys = rows.map(r => (-r.getLong(1), r.getString(0))).toSeq
    assert(keys == keys.sorted)
    val tfs = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf")).collect()
      .map(r => (r.getString(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    rows.foreach { r =>
      val v = tfs(r.getString(0))
      val df = v.length.toLong
      assert(r.getLong(1) == df && df >= 2)
      val mean = v.sum.toDouble / df
      val variance = v.map(x => (x - mean) * (x - mean)).sum / (df - 1)
      assert(math.abs(r.getDouble(2) - mean) < 1e-3)
      assert(math.abs(r.getDouble(3) - variance / mean) < 1e-3,
        s"vmr drifts for ${r.getString(0)}")
      assert(r.getDouble(3) >= 0.0)
    }
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

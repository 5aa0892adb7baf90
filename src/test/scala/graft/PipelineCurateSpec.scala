package graft

import org.apache.spark.sql.functions._

/** Invariants of the round-3 curation / relational / events wave that the
  * DuckDB oracle can't express (the oracle checks values; these check
  * semantics that must hold at ANY scale).
  */
class PipelineCurateSpec extends SparkSpecBase {

  private lazy val nDocs = Tables.t(spark, sf, "documents").count()

  test("boilerplate: one row per doc, ppm bounded, common ⊆ shingles") {
    val df = queries.PipelineCurate.qBoilerplate(spark, sf)
    assert(df.count() == nDocs)
    assert(df.filter(col("boiler_ppm") < 0 || col("boiler_ppm") > 1000000)
      .count() == 0)
    assert(df.filter(col("n_common") > col("n_shingles")).count() == 0)
  }

  test("mix sample: weights sum to ~1e6, kept within count, caps honored") {
    val rows = queries.PipelineCurate.qMixSample(spark, sf).collect()
    val wsum = rows.map(_.getLong(rows.head.fieldIndex("weight_ppm"))).sum
    // integer division truncation loses < |langs| ppm
    assert(wsum <= 1000000 && wsum >= 1000000 - rows.length)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_kept")) <= r.getLong(r.fieldIndex("n_docs")))
      assert(r.getLong(r.fieldIndex("keep_ppm")) <= 1000000)
    }
  }

  test("bpe pairs: every pair is 2 chars and counts are positive") {
    val rows = queries.PipelineCurate.qBpePairs(spark, sf).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getString(r.fieldIndex("pair")).length == 2)
      assert(r.getLong(r.fieldIndex("n")) > 0)
    }
  }

  test("char entropy: 0 ≤ H ≤ log2(alphabet), n matches text length") {
    val df = queries.PipelineCurate.qCharEntropy(spark, sf)
      .join(Tables.t(spark, sf, "documents"), "doc_id")
    assert(df.filter(col("n_chars_t") =!= length(col("text"))).count() == 0)
    // 27-char alphabet (a-z + space) bounds entropy at log2(27) ≈ 4.755
    assert(df.filter(col("entropy") < 0 || col("entropy") > 4.7549).count() == 0)
  }

  test("ngram lm: conditional ppm ≤ 1e6 and n ≤ n_prefix") {
    val rows = queries.PipelineCurate.qNgramLm(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n")) <= r.getLong(r.fieldIndex("n_prefix")))
      assert(r.getLong(r.fieldIndex("cond_ppm")) <= 1000000)
    }
  }

  test("decontam: benchmark source absent, hits ⊆ shingles") {
    val rows = queries.PipelineCurate.qDecontamNgram(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getString(r.fieldIndex("source")) != "src0")
      assert(r.getLong(r.fieldIndex("n_hit")) <= r.getLong(r.fieldIndex("n_shingles")))
    }
  }

  test("oov: rate in [0, 1e6]; a top-1000 vocab over a tiny corpus vocab → 0") {
    val rows = queries.PipelineCurate.qTokOov(spark, sf).collect()
    val distinctTerms = Tables.tokens(spark, sf).select("term").distinct().count()
    rows.foreach { r =>
      val ppm = r.getLong(r.fieldIndex("oov_ppm"))
      assert(ppm >= 0 && ppm <= 1000000)
      if (distinctTerms <= 1000) assert(ppm == 0)
    }
  }

  test("winnowing: fingerprint count ≤ window count, windows = shingles-3") {
    val df = queries.PipelineCurate.qWinnowFull(spark, sf)
    assert(df.filter(col("n_fp") > col("n_windows")).count() == 0)
    // docs with ≥4 shingles have exactly n_shingles-3 length-4 windows
    val sh = Tables.t(spark, sf, "documents")
      .withColumn("arr", split(col("text"), " "))
      .select(col("doc_id"),
        size(Tables.shingles3Arr(col("arr"), col("text"))).as("n_sh"))
    val joined = df.join(sh, "doc_id")
    assert(joined.filter(col("n_windows") =!= col("n_sh") - 3).count() == 0)
  }

  test("gaps-islands: island spans never overlap and gaps exceed 30 days") {
    val df = queries.RelationalExtra.qGapsIslands(spark, sf)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy("island")
    val withPrev = df.withColumn("prev_end", lag("end_date", 1).over(w))
    assert(withPrev.filter(col("prev_end").isNotNull &&
      datediff(col("start_date"), col("prev_end")) <= 30).count() == 0)
    // island order counts sum to the full table
    val total = df.agg(sum("n_orders")).collect()(0).getLong(0)
    assert(total == Tables.t(spark, sf, "orders").count())
  }

  test("seq fill: grid is dense — every month × priority present") {
    val rows = queries.RelationalExtra.qSeqFill(spark, sf).collect()
    val months = rows.map(_.get(0)).distinct.length
    val prios = rows.map(_.getString(1)).distinct.length
    assert(rows.length == months * prios)
    // filled rows have n = 0 and vice versa
    rows.foreach { r =>
      assert((r.getInt(r.fieldIndex("filled")) == 1) == (r.getLong(r.fieldIndex("n")) == 0))
    }
  }

  test("attribution: clicks precede purchases, window honored") {
    val rows = queries.EventsPlus.qEvtAttribution(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("attr_sec"))) {
        val sec = r.getLong(r.fieldIndex("attr_sec"))
        assert(sec >= 0 && sec <= 604800)
        assert(!r.isNullAt(r.fieldIndex("click_id")))
      }
    }
  }

  test("dwell: per-type gap counts sum to events minus one per user") {
    val rows = queries.EventsPlus.qEvtDwell(spark, sf).collect()
    val nGaps = rows.map(_.getLong(rows.head.fieldIndex("n"))).sum
    val ev = Tables.events(spark, sf)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(nGaps == expected)
  }

  test("ngram novelty: every distinct shingle is novel exactly once") {
    val rows = queries.PipelineCurate.qNgramNovelty(spark, sf).collect()
    val docs = Tables.t(spark, sf, "documents")
    assert(rows.map(_.getLong(1)).sum == docs.count())
    // each distinct corpus fingerprint has exactly one first-seen doc,
    // so the novel counts across sources sum to the distinct count
    val distinctShingles = docs
      .withColumn("arr", split(col("text"), " "))
      .select(explode(Tables.shingles3Arr(col("arr"), col("text")))
        .as("sh"))
      .select(Tables.md5Bucket(col("sh")))
      .distinct().count()
    assert(rows.map(_.getLong(3)).sum == distinctShingles)
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2)) // novel ≤ shingles
      val ppm = r.getDouble(4)
      assert(ppm >= 0 && ppm <= 1000000.0)
    }
  }
}

package graft

import org.apache.spark.sql.functions._

/** Extended pipeline family (§2.10b): sketches, ANN, text analysis,
  * multimodal plumbing. */
class PipelinePlusSpec extends SparkSpecBase {

  test("minhash: identical token sets ⇒ identical signatures (est 1.0)") {
    // q_dedup_near found jaccard-1.0 pairs; those must minhash to est 1.0
    val exact = queries.Pipeline.qDedupNear(spark, sf)
      .filter(col("jaccard") === 1.0).select("d1", "d2")
    val mh = queries.PipelinePlus.qDedupMinhash(spark, sf)
    val disagree = exact.join(mh, Seq("d1", "d2"))
      .filter(col("est_jaccard") =!= 1.0).count()
    assert(disagree == 0)
  }

  test("simhash: identical token sets ⇒ hamming distance 0") {
    val exact = queries.Pipeline.qDedupNear(spark, sf)
      .filter(col("jaccard") === 1.0).select("d1", "d2")
    val sh = queries.PipelinePlus.qDedupSimhash(spark, sf)
    val nonzero = exact.join(sh, Seq("d1", "d2"))
      .filter(col("hamming") =!= 0).count()
    assert(nonzero == 0)
  }

  test("embedding near-dup cosines are within [-1,1], descending") {
    val rows = queries.PipelinePlus.qDedupEmbed(spark, sf).collect()
    val sims = rows.map(r => r.getDouble(r.fieldIndex("cos")))
    assert(sims.nonEmpty)
    assert(sims.forall(s => s >= -1.0001 && s <= 1.0001))
    assert(sims.sameElements(sims.sorted.reverse))
  }

  test("IVF results never beat the brute-force global best") {
    val ivf = queries.PipelinePlus.qSimIvf(spark, sf).collect()
    val brute = queries.Pipeline.qSimCosineTopk(spark, sf).collect()
    val bruteBest = brute.map(r => r.getDouble(r.fieldIndex("cos"))).max
    val ivfBest = ivf.map(r => r.getDouble(r.fieldIndex("cos"))).max
    assert(ivfBest <= bruteBest + 1e-9)
    // probing one cell must still return a full top-10
    assert(ivf.length == 10)
  }

  test("token counting: whitespace and regex agree on this corpus") {
    // corpus tokens are [a-z0-9]+ runs, so the BPE-ish regex tokenizer
    // must agree with the whitespace one exactly
    val bad = queries.PipelinePlus.qTokenCount(spark, sf)
      .filter(col("ws_tokens") =!= col("re_tokens")).count()
    assert(bad == 0)
  }

  test("quality score stays in [0,1] and ttr*n_tok == n_unique") {
    val q = queries.PipelinePlus.qTextQuality(spark, sf)
    assert(q.filter(col("quality") < 0 || col("quality") > 1).count() == 0)
    val bad = q.filter(
      abs(col("ttr") * col("n_tok") - col("n_unique")) > 0.5).count()
    assert(bad == 0)
  }

  test("identical texts fingerprint identically; fingerprints are hex") {
    val fp = queries.PipelinePlus.qFingerprint(spark, sf)
    val docs = Tables.t(spark, sf, "documents")
    val byText = docs.join(fp, "doc_id")
      .groupBy("text").agg(countDistinct("fingerprint").as("nfp"))
    assert(byText.filter(col("nfp") > 1).count() == 0)
    assert(fp.filter(not(col("fingerprint").rlike("^[0-9a-f]{32}$")))
      .count() == 0)
  }

  test("lang-id is deterministic, total, and in-domain") {
    val a = queries.PipelinePlus.qTextLangId(spark, sf)
    val b = queries.PipelinePlus.qTextLangId(spark, sf)
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
    assert(a.count() == Tables.t(spark, sf, "documents").count())
    val langs = Seq("de", "en", "es", "fr", "zh")
    assert(a.filter(not(col("predicted").isInCollection(langs))).count() == 0)
  }

  test("lang-id classifies a separable synthetic corpus perfectly") {
    // The driver-corpus test above pins shape/determinism but not the
    // naive-bayes math. Here the math has a hand-computable answer: two
    // langs with DISJOINT bigram alphabets, so a doc's own-lang score is
    // a sum of observed log-probs while every other lang scores the
    // smoothing floor on all grams — the argmax margin is hundreds of
    // nats and no float subtlety can flip it. 100% self-classification
    // is the provable expected output, not a heuristic hope.
    val s = spark // stable identifier for the implicits import
    import s.implicits._
    val dir = TmpDirs.create("graft_langid_")
    (0L until 40L).map { i =>
      if (i % 2 == 0) (i, "ab" * (20 + (i % 7).toInt), "aa")
      else (i, "cd" * (20 + (i % 5).toInt), "cc")
    }.toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = queries.PipelinePlus.qTextLangId(spark, dir)
    assert(out.count() == 40)
    assert(out.filter(col("predicted") =!= col("actual")).count() == 0,
      "separable-corpus classification must be exact")
  }

  test("mm metadata: payload bytes == n_chars on an ASCII corpus") {
    val m = queries.PipelinePlus.qMmMeta(spark, sf)
    assert(m.filter(col("payload_bytes") =!= col("n_chars")).count() == 0)
    assert(m.filter(not(col("modality")
      .isInCollection(Seq("image", "audio", "video")))).count() == 0)
  }

  test("mm resize: pooled buckets equal a driver-side reference") {
    val rows = queries.PipelinePlus.qMmResize(spark, sf).collect()
    val texts = Tables.t(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length == texts.size)
    rows.take(20).foreach { r =>
      val payload = texts(r.getLong(0)).getBytes("UTF-8")
      val n = payload.length
      assert(r.getInt(r.fieldIndex("n_bytes")) == n)
      // pooled ships comma-joined at 4 dp (driver-hashable wire format)
      val pooled = r.getString(r.fieldIndex("pooled")).split(",")
        .map(_.toFloat)
      assert(pooled.length == 4)
      val b0 = payload.slice(0, n / 4)
      val ref0 = b0.map(_ & 0xff).sum.toFloat / b0.length
      assert(math.abs(pooled.head - ref0) < 1e-4 + math.abs(ref0) * 1e-4)
    }
  }

  test("mm frames: every 4th 16-byte frame, hash-stable") {
    val df = queries.PipelinePlus.qMmFrames(spark, sf)
    val again = queries.PipelinePlus.qMmFrames(spark, sf)
    assert(df.except(again).count() == 0 && again.except(df).count() == 0)
    val counts = df.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val texts = Tables.t(spark, sf, "documents")
      .select("doc_id", "text").collect()
    texts.take(20).foreach { r =>
      val n = r.getString(1).getBytes("UTF-8").length
      val expected = (0 until n / 16 by 4).size.toLong
      assert(counts.getOrElse(r.getLong(0), 0L) == expected)
    }
    // frame indices are the sampled stride
    assert(df.filter(col("frame_idx") % 4 =!= 0).count() == 0)
  }

  test("mm decode: fixed-width features, deterministic, bounded") {
    val d = queries.PipelinePlus.qMmDecode(spark, sf)
    val rows = d.collect()
    assert(rows.length == Tables.t(spark, sf, "documents").count())
    rows.foreach { r =>
      // features ship comma-joined at 6 dp (driver-hashable wire format)
      val feats = r.getString(r.fieldIndex("features")).split(",")
        .map(_.toFloat)
      assert(feats.length == 8)
      assert(feats.forall(f => f >= 0f && f <= 1f))
      assert(r.getInt(r.fieldIndex("width")) >= 1)
      assert(r.getInt(r.fieldIndex("height")) >= 1)
    }
    val again = queries.PipelinePlus.qMmDecode(spark, sf)
    assert(d.except(again).count() == 0)
  }
}

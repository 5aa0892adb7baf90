package graft

import org.apache.spark.sql.functions._

/** Algebraic invariants of the search-engine core (SURVEY.md §5.3). */
class SearchSpec extends SparkSpecBase {

  test("sum of term frequencies == total token count") {
    val tfSum = queries.Search.qTermFreq(spark, sf)
      .agg(sum("tf")).head.getLong(0)
    val tokens = Tables.tokens(spark, sf).count()
    assert(tfSum == tokens)
  }

  test("posting-list length == document frequency per term") {
    // ids ships comma-joined (driver-hashable wire format)
    val idx = queries.Search.qInvertedIndex(spark, sf)
      .select(col("term"), size(split(col("ids"), ",")).as("len"),
        col("df").as("own_df"))
    val df = queries.Search.qDocFreq(spark, sf)
    val mismatches = idx.join(df, "term")
      .filter(col("len") =!= col("df") || col("own_df") =!= col("df"))
      .count()
    assert(mismatches == 0)
  }

  test("tf-idf score == round(tf * ln(N/df), 4) for every row") {
    val n = Tables.t(spark, sf, "documents").count().toDouble
    val bad = queries.Search.qTfidf(spark, sf)
      .filter(col("score") =!=
        round(col("tf") * log(lit(n) / col("df")), 4)).count()
    assert(bad == 0)
  }

  test("conjunctive search results contain ALL query terms") {
    val hits = queries.Search.qSearchAnd(spark, sf).select("doc_id")
    val tok = Tables.docTerms(spark, sf)
    for (term <- Seq("spark", "join")) {
      val without = hits.join(
        tok.filter(col("term") === term), Seq("doc_id"), "left_anti").count()
      assert(without == 0, s"hit missing term '$term'")
    }
  }

  test("balanced interleave: unique docs/positions, each team in draft order") {
    val out = queries.SearchPlus.qEvalInterleave(spark, sf).collect()
    assert(out.length == 10)
    assert(out.map(_.getLong(0)).toSeq == (1L to 10L))          // pos 1..10
    assert(out.map(_.getLong(1)).distinct.length == 10)          // doc unique
    for (team <- Seq("lex", "sem")) {
      val ranks = out.filter(_.getString(2) == team).map(_.getLong(3)).toSeq
      assert(ranks == ranks.sorted)                              // draft order
    }
  }

  test("phrase hits all contain the phrase as a substring") {
    val phrase = queries.Search.qSearchPhrase(spark, sf).select("doc_id")
    val docs = Tables.t(spark, sf, "documents")
    val verified = phrase.join(docs, "doc_id")
      .filter(col("text").contains("hash join")).count()
    assert(verified == phrase.count() && verified > 0)
  }

  test("rank RBO: bounded by [0,1], consistent with the prefix overlap") {
    val r = queries.SearchPlus.qRankRbo(spark, sf).head
    val overlap10 = r.getLong(0)
    val rbo = r.getDouble(1)
    assert(overlap10 >= 0 && overlap10 <= 10)
    assert(rbo >= 0.0 && rbo <= 1.0, s"rbo=$rbo")
    // prefix agreements X_d/d are monotonically bounded by X_10/10 + …
    // ≥ check the two extremes: identical lists ⇒ 1.0; disjoint ⇒ 0.
    // Here the lists share overlap10 docs, so rbo = 0 iff overlap = 0
    // and rbo = 1 requires full agreement at EVERY depth.
    assert((rbo == 0.0) == (overlap10 == 0))
    if (overlap10 < 10) assert(rbo < 1.0)
  }

  test("eval MRR: one row per query, rr = 1/first relevant rank, mrr = mean") {
    val rows = queries.SearchPlus.qEvalMrr(spark, sf).collect()
    assert(rows.length == 4)
    def r4(x: Double): Double = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rrs = rows.map { r =>
      val k = r.getLong(1)
      assert(k >= 0 && k <= 10, s"first_rel_rank=$k out of top-10 range")
      val rr = if (k > 0) 1.0 / k else 0.0
      assert(math.abs(r.getDouble(2) - r4(rr)) < 1e-9)
      rr
    }
    val mrr = rows.head.getDouble(3)
    assert(rows.forall(_.getDouble(3) == mrr), "mrr must be constant")
    assert(math.abs(mrr - r4(rrs.sum / rrs.length)) < 1e-9)
    // the corpus words are common enough that at least one query must
    // find a relevant doc in its top 10 — otherwise the metric is vacuous
    assert(rrs.sum > 0.0)
  }

  test("topic log-odds: 3 ranked terms per source, in-source count positive") {
    val rows = queries.SearchPlus.qTopicLodds(spark, sf).collect()
    val nSources = Tables.t(spark, sf, "documents")
      .select("source").distinct().count()
    assert(rows.length == nSources * 3)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L, 3L))
      // ranked by the rounded statistic, descending
      val ls = rs.sortBy(_.getLong(1)).map(_.getDouble(4))
      assert(ls.zip(ls.tail).forall { case (a, b) => a >= b })
    }
    assert(rows.forall(_.getLong(3) >= 1), "top term absent from source")
  }
}

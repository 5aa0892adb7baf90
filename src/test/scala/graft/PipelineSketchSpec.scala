package graft

import org.apache.spark.sql.functions._

/** Properties of the sketch-accelerated scale paths: the bloom screen
  * must dominate the exact contamination join (no false negatives,
  * bounded false-positive excess), and PQ output must be a well-formed
  * ADC ranking (exactness is the DuckDB oracle's job).
  */
class PipelineSketchSpec extends SparkSpecBase {

  test("bloom contamination: superset of exact hits, bounded fp excess") {
    val bloom = queries.PipelineSketch.qContaminationBloom(spark, sf).cache()
    val exact = queries.PipelineSketch.contaminationExact(spark, sf)
    val joined = bloom.join(exact, Seq("doc_id"), "left")
      .withColumn("n_exact", coalesce(col("n_exact"), lit(0L))).cache()
    // a bloom filter admits no false negatives: every exact-hit shingle
    // must be flagged, per document
    assert(joined.filter(col("n_flagged") < col("n_exact")).count() == 0)
    // false-positive excess bounded: < 1% of probed shingles
    val agg = joined.agg(
      sum("n_flagged").as("f"), sum("n_exact").as("e"),
      sum("n_shingles").as("s")).head()
    assert(agg.getLong(0) - agg.getLong(1) <= agg.getLong(2) / 100,
      s"fp excess ${agg.getLong(0) - agg.getLong(1)} over ${agg.getLong(2)} probes")
  }

  test("cms: estimates dominate exact counts within the ε·N bound") {
    val rows = queries.PipelineSketch.qAggCms(spark, sf).collect()
    assert(rows.length == 20)
    val n = Tables.tokens(spark, sf).count()
    rows.foreach { r =>
      val (tf, est) = (r.getLong(1), r.getLong(2))
      assert(est >= tf, s"${r.getString(0)}: CMS underestimated")
      assert(est - tf <= math.ceil(0.001 * n).toLong,
        s"${r.getString(0)}: overcount ${est - tf} breaches eps*N")
    }
  }

  test("hll union: merged estimate within 5% of exact, per scope") {
    val rows = queries.PipelineSketch.qAggHllUnion(spark, sf).collect()
    assert(rows.map(_.getString(0)).contains("ALL"))
    rows.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      assert(math.abs(est - exact) <= math.max(1L, exact / 20),
        s"${r.getString(0)}: HLL est $est vs exact $exact")
    }
  }

  test("pq: well-formed ADC ranking") {
    val rows = queries.PipelineSketch.qSimPq(spark, sf).collect()
    assert(rows.length == 10)
    assert(rows.forall(_.getLong(0) != 0L)) // query itself excluded
    for (m <- 1 to 4)
      assert(rows.forall(r => (0 to 9).contains(r.getInt(m))), s"code$m range")
    val dists = rows.map(_.getLong(5))
    assert(dists.forall(_ >= 0L))
    assert(dists.sameElements(dists.sorted), "ascending ADC order")
  }
}

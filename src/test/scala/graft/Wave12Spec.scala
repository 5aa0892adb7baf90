package graft

import org.apache.spark.sql.functions._

/** Round-12 wave evidence: theta-sketch set algebra over the KMV grid
  * (`q_kmv_theta`), plus the two oracle graduations' in-engine bounds
  * (the DuckDB mirrors are the primary check; these pin the engine-side
  * semantics a hash compare can't explain).
  */
class Wave12Spec extends SparkSpecBase {

  test("q_kmv_theta: pair grid is complete and internally consistent") {
    val rows = SparkEntry.queries("q_kmv_theta")(spark, sf).collect()
    // one row per unordered event_type pair
    val types = rows.map(_.getString(0)).toSet ++ rows.map(_.getString(1))
    assert(rows.length == types.size * (types.size - 1) / 2,
      s"expected C(${types.size},2) pairs, got ${rows.length}")
    // exact audit identity: inter_exact + diff_exact = |A| — recomputed
    // here from the same item definition the query uses
    val nExact = Tables.events(spark, sf)
      .select(col("event_type"), concat(col("user_id").cast("string"),
        lit("/"), to_date(col("ts")).cast("string")).as("item"))
      .distinct().groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (a, ie, de) = (r.getString(0),
        r.getLong(r.fieldIndex("inter_exact")),
        r.getLong(r.fieldIndex("diff_exact")))
      assert(ie + de == nExact(a),
        s"pair ($a,${r.getString(1)}): inter+diff ${ie + de} != |A| " +
          s"${nExact(a)}")
    }
    // estimates are non-negative and deterministic across invocations
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("inter_est")) >= 0)
      assert(r.getLong(r.fieldIndex("diff_est")) >= 0)
    }
    val again = SparkEntry.queries("q_kmv_theta")(spark, sf).collect()
    assert(rows.toSeq == again.toSeq, "theta output is nondeterministic")
  }

  test("q_kmv_theta: estimator error within the k=64 sampling envelope") {
    // data-dependent evidence, not proof (the oracle is the proof of
    // cross-engine agreement): with ~37% pairwise overlap and k = 64,
    // the θ-sample holds ≈14 intersection entries → rse ≈ 27%; assert
    // a 3σ-ish envelope so regenerated data can't flake the suite
    val rows = SparkEntry.queries("q_kmv_theta")(spark, sf).collect()
    val worst = rows.map(_.getLong(rows.head.fieldIndex("inter_err_ppm"))).max
    assert(worst <= 900000L,
      s"theta intersection error $worst ppm exceeds the 90% envelope")
  }
}

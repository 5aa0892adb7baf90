package graft

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._

/** §2.13 extension surface: custom Expression (codegen + interpreted),
  * typed Aggregator, UDF, and the HLL tolerance row.
  */
class CustomSpec extends SparkSpecBase {

  test("Fnv1a64 matches published FNV-1a 64 test vectors") {
    def h(s: String): Long =
      functions.Fnv1a64.hash(s.getBytes(StandardCharsets.UTF_8))
    assert(h("") == 0xcbf29ce484222325L)
    assert(h("a") == 0xaf63dc4c8601ec8cL)
    assert(h("foobar") == 0x85944171f73967e8L)
  }

  test("Fnv1a64 codegen and interpreted paths agree") {
    val sp = spark
    import sp.implicits._
    val df = Seq("", "a", "hash join", "ünïcödé ☃").toDF("s")
    val viaExpr = df.select(functions.Fnv1a64(col("s")).as("h"))
      .collect().map(_.getLong(0))
    val reference = Seq("", "a", "hash join", "ünïcödé ☃")
      .map(s => functions.Fnv1a64.hash(s.getBytes(StandardCharsets.UTF_8)))
    assert(viaExpr.toSeq == reference)
    // Force the interpreted (non-codegen) path too.
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interp = df.select(functions.Fnv1a64(col("s")).as("h"))
        .collect().map(_.getLong(0))
      assert(interp.toSeq == reference)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("x_expr_custom hashes match driver-side recomputation") {
    val rows = graft.udf.Custom.xExprCustom(spark, sf)
      .join(Tables.t(spark, sf, "documents"), "doc_id")
      .select("text", "fnv").collect()
    rows.foreach { r =>
      val expected = functions.Fnv1a64.hash(
        r.getString(0).getBytes(StandardCharsets.UTF_8))
      assert(r.getLong(1) == expected)
    }
  }

  test("geometric-mean Aggregator equals exp(avg(ln)) closed form") {
    val got = graft.udf.Custom.qUdafTyped(spark, sf)
      .select("l_returnflag", "geo_mean_qty").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val expected = Tables.t(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(round(exp(avg(log(col("l_quantity")))), 4).as("g"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == expected)
  }

  test("approx_count_distinct within 5% of exact (q_agg_hll contract)") {
    val df = Tables.t(spark, sf, "lineitem")
    val exact = df.select(countDistinct("l_partkey")).head.getLong(0)
    val approx = df.select(approx_count_distinct("l_partkey")).head.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact <= 0.05)
  }

  test("scalar UDF vowel count matches a driver-side recount") {
    val sample = graft.udf.Custom.qUdfScalar(spark, sf).limit(50)
      .join(Tables.t(spark, sf, "documents"), "doc_id")
      .select("text", "n_vowels").collect()
    sample.foreach { r =>
      val expected = r.getString(0).count("aeiou".contains(_)).toLong
      assert(r.getLong(1) == expected)
    }
  }
}

package graft

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._

/** The injected Catalyst surface: SQL-registered native functions and the
  * size(split(s,' ')) → TokenCount optimizer rewrite. */
class CatalystExtensionSpec extends SparkSpecBase {

  GraftExtensions.install(spark)

  test("token_count SQL function equals size(split)") {
    val docs = Tables.t(spark, sf, "documents")
    val bad = docs.selectExpr("doc_id", "token_count(text) AS tc",
      "size(split(text, ' ')) AS sz").filter(col("tc") =!= col("sz"))
    assert(bad.count() == 0)
  }

  test("token_count edge cases match split semantics") {
    val rows = spark.sql(
      "SELECT token_count('a'), token_count('a b'), token_count(' '), " +
        "token_count('a  b'), token_count(NULL)").head()
    assert(rows.getInt(0) == 1)
    assert(rows.getInt(1) == 2)
    assert(rows.getInt(2) == 2)  // split(' ', ' ', -1) = ["", ""]
    assert(rows.getInt(3) == 3)  // double space ⇒ empty middle token
    assert(rows.isNullAt(4))
  }

  test("fnv1a64 SQL function matches the Scala implementation") {
    val got = spark.sql("SELECT fnv1a64('hash join')").head.getLong(0)
    assert(got == functions.Fnv1a64.hash(
      "hash join".getBytes(StandardCharsets.UTF_8)))
  }

  test("array_dot equals the aggregate/zip_with HOF bit-for-bit") {
    val emb = Tables.t(spark, sf, "embeddings")
      .withColumn("v", col("embedding").cast("array<double>"))
    val bad = emb.select(
      functions.VectorOps.dot(col("v"), col("v")).as("native"),
      expr("aggregate(zip_with(v, v, (x, y) -> x * y), " +
        "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)").as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(bad.count() == 0)
  }

  test("array_dot SQL registration and null/ragged behavior") {
    val r = spark.sql(
      "SELECT array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)), " +
        "array_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)), " +
        "array_dot(array(1.0d, 2.0d, 9.0d), array(5.0d))").head()
    assert(r.getDouble(0) == 11.0)
    assert(r.isNullAt(1))
    assert(r.getDouble(2) == 5.0) // shorter length wins, no throw
  }

  test("spark.sql.extensions=graft.GraftExtensions wires rule + strategy + functions") {
    // The install() path (live-session registration) is what Verify/Bench
    // use; this exercises the OTHER registration route — a session BUILT
    // with the extension class applied (what `spark.sql.extensions=
    // graft.GraftExtensions` does; the static conf itself cannot take
    // effect on the suite's already-running context), where
    // injectFunction / injectOptimizerRule / injectPlannerStrategy all
    // apply (SURVEY.md §4.3).
    val s2 = org.apache.spark.sql.graft.Shim
      .sessionWithExtensions(spark, new GraftExtensions()(_))
    // injected functions resolve in SQL
    assert(s2.sql("SELECT token_count('a b c')").head.getInt(0) == 3)
    assert(s2.sql("SELECT fnv1a64('hash join')").head.getLong(0) ==
      functions.Fnv1a64.hash("hash join".getBytes(StandardCharsets.UTF_8)))
    assert(s2.sql(
      "SELECT array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))")
      .head.getDouble(0) == 11.0)
    // injected optimizer rule fires
    val df = s2.read.parquet(s"$sf/documents.parquet")
      .select(size(split(col("text"), " ")).as("n"))
    assert(df.queryExecution.optimizedPlan.expressions.exists(_.exists {
      case _: graft.functions.TokenCount => true
      case _ => false
    }), "injected OptimizeTokenCount did not fire")
    // injected planner strategy plans the custom as-of operator
    val l = s2.range(10).select((col("id") % 2).as("k"), col("id").as("t"))
    val r = s2.range(5).select((col("id") % 2).as("rk"),
      (col("id") * 2).as("rt"), col("id").as("v"))
    val asof = plans.AsofOps.join(l, r,
      l("k"), r("rk"), l("t"), r("rt"))
    assert(asof.queryExecution.executedPlan.toString.contains("AsofJoin"),
      "injected AsofJoinStrategy did not plan the custom exec")
    assert(asof.count() == 10) // LEFT OUTER: every left row survives
  }

  test("OptimizeTokenCount rewrites size(split(s, ' ')) in the plan") {
    val df = Tables.t(spark, sf, "documents")
      .select(size(split(col("text"), " ")).as("n"))
    val optimized = df.queryExecution.optimizedPlan
    val hasTokenCount = optimized.expressions.exists(_.exists {
      case _: graft.functions.TokenCount => true
      case _ => false
    })
    assert(hasTokenCount, s"rewrite did not fire:\n$optimized")
    // and the rewritten plan still computes the right answer
    val viaRule = df.agg(sum("n")).head.getLong(0)
    val viaUdfRef = Tables.t(spark, sf, "documents")
      .select(udf((s: String) => s.split(" ", -1).length)
        .apply(col("text")).as("n"))
      .agg(sum("n")).head.getLong(0)
    assert(viaRule == viaUdfRef)
  }
}

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

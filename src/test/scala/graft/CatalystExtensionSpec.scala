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

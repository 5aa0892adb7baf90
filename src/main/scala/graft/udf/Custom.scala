package graft.udf

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.Tables

/** UDF / UDAF / UDTF surface (SURVEY.md §2.13) — the Spark-native analog
  * of the reference's custom Mapper/Reducer classes.
  */
object Custom {

  /** Scalar UDF: vowel count per document. (A Scala UDF is the floor of
    * the extension hierarchy — see graft.functions.Fnv1a64 for the
    * codegen'd Expression ceiling.) */
  def qUdfScalar(spark: SparkSession, sfDir: String): DataFrame = {
    // Option return: String is a reference type, so Spark hands a NULL
    // text straight to the lambda — a bare s.count would NPE the task
    // where the oracle's regexp arithmetic propagates NULL. None ↦ NULL
    // keeps the UDF total and oracle-consistent.
    val vowels =
      udf((s: String) => Option(s).map(_.count("aeiou".contains(_)).toLong))
    Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), vowels(col("text")).as("n_vowels"))
      .orderBy("doc_id")
  }

  val qUdfScalarSql: String =
    """SELECT doc_id,
      |  length(text) - length(regexp_replace(text, '[aeiou]', '', 'g'))
      |    AS n_vowels
      |FROM documents ORDER BY doc_id""".stripMargin

  case class GeoMeanBuf(sumLn: Double, n: Long)

  /** Typed Aggregator: geometric mean — partial (reduce) + merge + finish,
    * the same combiner shape MapReduce hand-codes. */
  object GeoMean extends Aggregator[Double, GeoMeanBuf, Double] {
    def zero: GeoMeanBuf = GeoMeanBuf(0.0, 0L)
    def reduce(b: GeoMeanBuf, a: Double): GeoMeanBuf =
      GeoMeanBuf(b.sumLn + math.log(a), b.n + 1)
    def merge(x: GeoMeanBuf, y: GeoMeanBuf): GeoMeanBuf =
      GeoMeanBuf(x.sumLn + y.sumLn, x.n + y.n)
    def finish(b: GeoMeanBuf): Double = math.exp(b.sumLn / b.n)
    def bufferEncoder: Encoder[GeoMeanBuf] = Encoders.product[GeoMeanBuf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  def qUdafTyped(spark: SparkSession, sfDir: String): DataFrame = {
    val gm = udaf(GeoMean)
    Tables.t(spark, sfDir, "lineitem")
      .groupBy("l_returnflag")
      .agg(round(gm(col("l_quantity")), 4).as("geo_mean_qty"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  val qUdafTypedSql: String =
    """SELECT l_returnflag,
      |  round(exp(avg(ln(l_quantity))), 4) AS geo_mean_qty,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Generator (UDTF-shaped): doc → bigram rows via typed flatMap. */
  def qUdtfExplode(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        text.split(' ').iterator.sliding(2).withPartial(false)
          .map(p => (id, p.head + " " + p(1)))
      }
      .toDF("doc_id", "bigram")
      .groupBy("doc_id", "bigram")
      .agg(count(lit(1)).as("n"))
      .orderBy("doc_id", "bigram")
  }

  val qUdtfExplodeSql: String =
    """SELECT doc_id, arr[i] || ' ' || arr[i + 1] AS bigram, count(*) AS n
      |FROM (SELECT doc_id, string_split(text, ' ') AS arr FROM documents) d,
      |  unnest(generate_series(1, len(arr) - 1)) AS t(i)
      |GROUP BY doc_id, bigram ORDER BY doc_id, bigram""".stripMargin

  /** Custom codegen'd Catalyst Expression in a query. Round 6: graduated
    * from oracle=unit to a DuckDB oracle — FNV-1a-64 is pure integer
    * arithmetic, so the oracle re-derives it with a HUGEINT fold
    * ([[Tables.fnv1a64Sql]]); CustomSpec keeps the interpreted/codegen
    * parity check as extra in-engine evidence. */
  def xExprCustom(spark: SparkSession, sfDir: String): DataFrame =
    Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"),
        graft.functions.Fnv1a64(col("text")).as("fnv"),
        graft.functions.Fnv1a64(col("lang")).as("fnv_lang"))
      .orderBy("doc_id")

  val xExprCustomSql: String =
    s"""SELECT doc_id,
       |  ${Tables.toSignedLongSql("ht")} AS fnv,
       |  ${Tables.toSignedLongSql("hl")} AS fnv_lang
       |FROM (SELECT doc_id,
       |    ${Tables.fnv1a64Sql(Tables.asciiBytesSql("text"))} AS ht,
       |    ${Tables.fnv1a64Sql(Tables.asciiBytesSql("lang"))} AS hl
       |  FROM documents)
       |ORDER BY doc_id""".stripMargin
}

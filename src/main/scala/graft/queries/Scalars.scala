package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Scalar function surface: string / date / math / array / map / JSON
  * (SURVEY.md §2.8).
  *
  * Cross-engine type notes: DuckDB `length`/`len`/`year`/`date_diff`
  * return BIGINT where Spark returns INT → Spark side casts to long;
  * DuckDB `floor`/`ceil` return DECIMAL → oracle casts to BIGINT;
  * Spark `signum` returns DOUBLE → both sides cast to INT;
  * DuckDB `regexp_replace` needs the 'g' flag for replace-all.
  */
object Scalars {

  def qFnString(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "part")
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("up"),
        lower(col("p_brand")).as("low"),
        substring(col("p_name"), 1, 3).as("sub3"),
        concat(col("p_brand"), lit("-"), col("p_name")).as("cat"),
        trim(concat(lit(" "), col("p_name"), lit(" "))).as("trimmed"),
        length(col("p_name")).cast("long").as("len"),
        expr("replace(p_name, 'red', 'xx')").as("repl"),
        lpad(col("p_brand"), 10, "*").as("lp"),
        size(split(col("p_name"), " ")).cast("long").as("nwords"),
        levenshtein(col("p_name"), col("p_brand")).cast("long").as("lev"),
        regexp_extract(col("p_name"), "([a-z]+) ([a-z]+)", 2).as("word2"),
        regexp_replace(col("p_name"), "[aeiou]", "#").as("novowel"))
      .orderBy("p_partkey")

  val qFnStringSql: String =
    """SELECT p_partkey,
      |  upper(p_name) AS up, lower(p_brand) AS low,
      |  substring(p_name, 1, 3) AS sub3,
      |  p_brand || '-' || p_name AS cat,
      |  trim(' ' || p_name || ' ') AS trimmed,
      |  length(p_name) AS len,
      |  replace(p_name, 'red', 'xx') AS repl,
      |  lpad(p_brand, 10, '*') AS lp,
      |  CAST(len(string_split(p_name, ' ')) AS BIGINT) AS nwords,
      |  CAST(levenshtein(p_name, p_brand) AS BIGINT) AS lev,
      |  regexp_extract(p_name, '([a-z]+) ([a-z]+)', 2) AS word2,
      |  regexp_replace(p_name, '[aeiou]', '#', 'g') AS novowel
      |FROM part ORDER BY p_partkey""".stripMargin

  def qFnDate(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        dayofmonth(col("o_orderdate")).cast("long").as("dy"),
        quarter(col("o_orderdate")).cast("long").as("qtr"),
        date_trunc("month", col("o_orderdate")).as("mon_start"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("timestamp"))
          .cast("long").as("days_since_95"),
        add_months(col("o_orderdate"), 3).as("plus3"))
      .orderBy("o_orderkey")

  val qFnDateSql: String =
    """SELECT o_orderkey,
      |  year(o_orderdate) AS yr, month(o_orderdate) AS mo,
      |  day(o_orderdate) AS dy, quarter(o_orderdate) AS qtr,
      |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon_start,
      |  date_diff('day', TIMESTAMP '1995-01-01', o_orderdate)
      |    AS days_since_95,
      |  CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3
      |FROM orders ORDER BY o_orderkey""".stripMargin

  def qFnMath(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "part")
      .select(
        col("p_partkey"),
        round(sqrt(col("p_retailprice")), 4).as("sq"),
        abs(col("p_size") - 20).as("ab"),
        floor(col("p_retailprice") / 7).as("fl"),
        ceil(col("p_retailprice") / 7).as("ce"),
        round(log(col("p_retailprice")), 4).as("lnp"),
        round(log10(col("p_retailprice")), 4).as("l10"),
        round(exp(col("p_size") / 50.0), 4).as("ex"),
        round(pow(col("p_size"), 2), 4).as("pw"),
        expr("mod(p_size, 7)").as("md"),
        signum(col("p_size") - 20).cast("int").as("sg"))
      .orderBy("p_partkey")

  val qFnMathSql: String =
    """SELECT p_partkey,
      |  round(sqrt(p_retailprice), 4) AS sq,
      |  abs(p_size - 20) AS ab,
      |  CAST(floor(p_retailprice / 7) AS BIGINT) AS fl,
      |  CAST(ceil(p_retailprice / 7) AS BIGINT) AS ce,
      |  round(ln(p_retailprice), 4) AS lnp,
      |  round(log10(p_retailprice), 4) AS l10,
      |  round(exp(p_size / 50.0), 4) AS ex,
      |  round(pow(p_size, 2), 4) AS pw,
      |  mod(p_size, 7) AS md,
      |  CAST(sign(p_size - 20) AS INT) AS sg
      |FROM part ORDER BY p_partkey""".stripMargin

  def qFnArray(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "embeddings")
      .select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("n"),
        round(element_at(col("embedding"), 1).cast("double"), 4).as("first"),
        round(element_at(col("embedding"), -1).cast("double"), 4).as("last"),
        // serialized (scaled-long) — the driver comparator can't hash raw
        // array cells; floor(x*1e4 + 0.5) is the same IEEE arithmetic on
        // both engines, so the string is engine-stable
        array_join(transform(sort_array(array_intersect(
            slice(col("embedding"), 1, 5),
            slice(col("embedding"), 3, 5))),
          x => floor(x.cast("double") * 10000 + 0.5).cast("long")
            .cast("string")), ",").as("inter"),
        array_contains(slice(col("embedding"), 2, 63),
          element_at(col("embedding"), 1)).as("has_first_in_tail"))
      .orderBy("vec_id")

  val qFnArraySql: String =
    """SELECT vec_id,
      |  len(embedding) AS n,
      |  round(CAST(embedding[1] AS DOUBLE), 4) AS first,
      |  round(CAST(embedding[-1] AS DOUBLE), 4) AS last,
      |  array_to_string(list_transform(
      |    list_sort(list_intersect(list_slice(embedding, 1, 5),
      |      list_slice(embedding, 3, 7))),
      |    x -> CAST(CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT)
      |         AS VARCHAR)), ',') AS inter,
      |  list_contains(list_slice(embedding, 2, 64), embedding[1])
      |    AS has_first_in_tail
      |FROM embeddings ORDER BY vec_id""".stripMargin

  def qFnMap(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "nation")
      .select(
        col("n_nationkey"),
        col("n_name"),
        element_at(map(col("n_name"), col("n_nationkey")), col("n_name"))
          .as("mval"))
      .orderBy("n_nationkey")

  val qFnMapSql: String =
    """SELECT n_nationkey, n_name,
      |  map([n_name], [n_nationkey])[n_name][1] AS mval
      |FROM nation ORDER BY n_nationkey""".stripMargin

  def qFnJson(spark: SparkSession, sfDir: String): DataFrame =
    graft.Tables.events(spark, sfDir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy("event_type")
      .agg(sum("k").as("k_sum"), count(lit(1)).as("n"))
      .orderBy("event_type")

  val qFnJsonSql: String =
    """SELECT event_type,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT)
      |    AS k_sum,
      |  count(*) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
}

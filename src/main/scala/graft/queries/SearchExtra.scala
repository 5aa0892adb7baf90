package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-3 search breadth (SURVEY.md §2.9): regex retrieval and
  * segment-index merging — the remaining index-lifecycle pieces around
  * the WAND/compression internals in [[SearchIndex]].
  *
  * Scale notes: regex retrieval is one narrow codegen'd scan (the regex
  * runs inside WholeStageCodegen; only `doc_id` and the match count
  * survive the projection). Segment merge is the compaction primitive of
  * every log-structured index: each segment's postings are built with a
  * map-side-combinable aggregate, and the merge itself is a term-keyed
  * equi-join of two ALREADY-AGGREGATED (vocabulary-sized) relations —
  * at 100 TB the join input is the vocabulary, never the corpus.
  */
object SearchExtra {

  // Alternation-of-literals only: identical non-overlapping leftmost
  // match semantics in java.util.regex (Spark) and RE2 (DuckDB).
  private val Pattern = "(fast|slow) (join|merge)"

  /** Regex retrieval: documents matching a token-bigram pattern, ranked
    * by match count. The predicate and count run in one narrow scan —
    * no shuffle until the bounded top-50 sort. */
  def qSearchRegex(spark: SparkSession, sfDir: String): DataFrame =
    Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"),
        regexp_count(col("text"), lit(Pattern)).cast("long").as("n_hits"))
      .filter(col("n_hits") > 0)
      .orderBy(desc("n_hits"), asc("doc_id"))
      .limit(50)

  val qSearchRegexSql: String =
    s"""SELECT doc_id,
       |  CAST(len(regexp_extract_all(text, '$Pattern')) AS BIGINT) AS n_hits
       |FROM documents
       |WHERE len(regexp_extract_all(text, '$Pattern')) > 0
       |ORDER BY n_hits DESC, doc_id LIMIT 50""".stripMargin

  /** One segment's posting lists: docs with `doc_id % 2 == parity`,
    * aggregated to (term, sorted id array). Partial-aggregable — each
    * executor pre-collects its local postings before the term shuffle. */
  private def segment(spark: SparkSession, sfDir: String,
      parity: Int): DataFrame =
    Tables.docTerms(spark, sfDir)
      .filter(col("doc_id") % 2 === parity)
      .groupBy("term")
      .agg(sort_array(collect_set(col("doc_id"))).as("ids"))

  /** LSM-style segment merge: two independently-built index segments
    * (even/odd docs — stand-ins for "yesterday's index" and "today's
    * delta") full-outer-merged on term into one compacted index. A term
    * missing from one segment keeps the other's postings verbatim.
    * Output is the merged df and the posting list serialized to the
    * string wire format (arrays are driver-unhashable).
    */
  def qIndexMerge(spark: SparkSession, sfDir: String): DataFrame = {
    val empty = array().cast("array<bigint>")
    val a = segment(spark, sfDir, 0).withColumnRenamed("ids", "ids_a")
    val b = segment(spark, sfDir, 1).withColumnRenamed("ids", "ids_b")
    a.join(b, Seq("term"), "full_outer")
      .withColumn("merged",
        sort_array(concat(coalesce(col("ids_a"), empty),
          coalesce(col("ids_b"), empty))))
      .select(col("term"),
        size(col("merged")).cast("long").as("df"),
        size(coalesce(col("ids_a"), empty)).cast("long").as("df_a"),
        size(coalesce(col("ids_b"), empty)).cast("long").as("df_b"),
        array_join(transform(col("merged"), _.cast("string")), ",")
          .as("postings"))
      .orderBy("term")
  }

  val qIndexMergeSql: String =
    """WITH dt AS (SELECT DISTINCT doc_id, term
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |        FROM documents)),
      |sa AS (SELECT term, list(doc_id ORDER BY doc_id) AS ids_a
      |  FROM dt WHERE doc_id % 2 = 0 GROUP BY term),
      |sb AS (SELECT term, list(doc_id ORDER BY doc_id) AS ids_b
      |  FROM dt WHERE doc_id % 2 = 1 GROUP BY term),
      |m AS (SELECT coalesce(sa.term, sb.term) AS term,
      |    coalesce(sa.ids_a, []) AS ids_a, coalesce(sb.ids_b, []) AS ids_b
      |  FROM sa FULL OUTER JOIN sb ON sa.term = sb.term)
      |SELECT term,
      |  CAST(len(ids_a) + len(ids_b) AS BIGINT) AS df,
      |  CAST(len(ids_a) AS BIGINT) AS df_a,
      |  CAST(len(ids_b) AS BIGINT) AS df_b,
      |  array_to_string(list_sort(list_concat(ids_a, ids_b)), ',')
      |    AS postings
      |FROM m ORDER BY term""".stripMargin

  private val BoolTerms = Seq("spark", "join", "stream", "vector", "batch")

  /** Nested boolean retrieval: (spark AND join AND NOT stream) OR
    * (vector AND batch). Postings for the 5 query terms collapse to
    * per-doc presence bits in ONE partial-aggregable max(CASE) pass —
    * the filter on the bounded term set prunes the token stream before
    * the doc_id shuffle, and arbitrary boolean nesting is then a scalar
    * predicate over the bit columns (no per-clause set ops, no
    * intersect/except chain). Docs containing none of the terms can
    * satisfy neither positive clause, so pre-filtering them is exact.
    */
  def qSearchBoolean(spark: SparkSession, sfDir: String): DataFrame = {
    def bit(t: String) =
      max(when(col("term") === t, 1L).otherwise(0L)).as(s"has_$t")
    val flags = Tables.docTerms(spark, sfDir)
      .filter(col("term").isin(BoolTerms: _*))
      .groupBy("doc_id")
      .agg(bit("spark"), bit("join"), bit("stream"), bit("vector"),
        bit("batch"))
    flags.filter(
      (col("has_spark") === 1 && col("has_join") === 1
        && col("has_stream") === 0)
        || (col("has_vector") === 1 && col("has_batch") === 1))
      .orderBy("doc_id")
  }

  val qSearchBooleanSql: String =
    """WITH dt AS (SELECT DISTINCT doc_id, term
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |        FROM documents)
      |  WHERE term IN ('spark', 'join', 'stream', 'vector', 'batch')),
      |f AS (SELECT doc_id,
      |    max(CASE WHEN term = 'spark' THEN 1 ELSE 0 END) AS has_spark,
      |    max(CASE WHEN term = 'join' THEN 1 ELSE 0 END) AS has_join,
      |    max(CASE WHEN term = 'stream' THEN 1 ELSE 0 END) AS has_stream,
      |    max(CASE WHEN term = 'vector' THEN 1 ELSE 0 END) AS has_vector,
      |    max(CASE WHEN term = 'batch' THEN 1 ELSE 0 END) AS has_batch
      |  FROM dt GROUP BY doc_id)
      |SELECT doc_id, CAST(has_spark AS BIGINT) AS has_spark,
      |  CAST(has_join AS BIGINT) AS has_join,
      |  CAST(has_stream AS BIGINT) AS has_stream,
      |  CAST(has_vector AS BIGINT) AS has_vector,
      |  CAST(has_batch AS BIGINT) AS has_batch
      |FROM f
      |WHERE (has_spark = 1 AND has_join = 1 AND has_stream = 0)
      |   OR (has_vector = 1 AND has_batch = 1)
      |ORDER BY doc_id""".stripMargin
}

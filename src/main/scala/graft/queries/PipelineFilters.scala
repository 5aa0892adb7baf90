package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Fourth-wave training-data curation operators (SURVEY.md §2.10e):
  * rule-based document quality filtering in the style of the published
  * Gopher/C4 heuristics, and PII scrubbing.
  *
  * Scale notes: both operators are single narrow codegen passes over the
  * documents scan — no shuffle except the final deterministic sort. At
  * 100 TB they pipeline with the scan (predicate/column pruning reach
  * parquet); the regexes and higher-order functions stay inside
  * whole-stage codegen.
  */
object PipelineFilters {

  /** Stopword list shared by the rule filter and its oracle — the
    * high-frequency function words present in the synthetic vocabulary. */
  private val Stopwords = Seq("the", "a", "of", "to", "and")

  // ───────────── Gopher-style rule filter (Rae et al. 2021) ─────────────

  /** Per-document quality rules: word-count band, mean-word-length band,
    * and a minimum stopword count (the "natural language, not a listing"
    * test). Emits the metrics plus the per-rule flags so downstream can
    * audit WHY a document dropped, and the final keep decision.
    */
  def qGopherFilter(spark: SparkSession, sfDir: String): DataFrame = {
    val words = split(col("text"), " ")
    val nWords = size(words).cast("long")
    // total word chars = doc length minus the (n-1) separating spaces
    val meanLen = (length(col("text")) - nWords + lit(1)).cast("double") / nWords
    val stopHits = size(filter(words,
      t => t.isInCollection(Stopwords))).cast("long")
    Tables.t(spark, sfDir, "documents")
      .select(
        col("doc_id"),
        nWords.as("n_words"),
        round(meanLen, 4).as("mean_wlen"),
        stopHits.as("stop_hits"),
        (nWords >= 50 && nWords <= 100000).as("ok_count"),
        (meanLen >= 3.0 && meanLen <= 10.0).as("ok_wlen"),
        (stopHits >= 2L).as("ok_stop"))
      .withColumn("keep", col("ok_count") && col("ok_wlen") && col("ok_stop"))
      .orderBy("doc_id")
  }

  val qGopherFilterSql: String =
    s"""WITH m AS (SELECT doc_id,
      |    len(string_split(text, ' ')) AS n_words,
      |    CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE)
      |      / len(string_split(text, ' ')) AS mean_wlen,
      |    len(list_filter(string_split(text, ' '),
      |      t -> t IN (${Stopwords.map("'" + _ + "'").mkString(", ")})))
      |      AS stop_hits
      |  FROM documents)
      |SELECT doc_id, n_words, round(mean_wlen, 4) AS mean_wlen, stop_hits,
      |  n_words BETWEEN 50 AND 100000 AS ok_count,
      |  mean_wlen BETWEEN 3.0 AND 10.0 AS ok_wlen,
      |  stop_hits >= 2 AS ok_stop,
      |  (n_words BETWEEN 50 AND 100000) AND (mean_wlen BETWEEN 3.0 AND 10.0)
      |    AND stop_hits >= 2 AS keep
      |FROM m ORDER BY doc_id""".stripMargin

  // ─────────────── unigram-surprisal quality scoring ───────────────

  /** Language-model quality proxy without an external LM: score every
    * document by its mean unigram surprisal −avg log₂ p(token) under the
    * corpus's own unigram distribution (the cheap stand-in for a
    * perplexity filter). One tf aggregate builds the vocabulary (≪
    * corpus → broadcast), then a narrow scoring pass; the corpus total
    * rides along as a broadcast scalar.
    */
  /** Per-doc (doc_id, n_tok, surprisal-4dp) — THE shared surprisal
    * definition. qQualityBucket buckets by exactly this score, so the
    * two operators must stay bit-identical; one builder (and one SQL
    * CTE chain below) makes a drift impossible, the Events.sessionized
    * pattern. Vocabulary tf ≪ corpus → broadcast; the corpus total
    * rides along as a broadcast scalar.
    */
  private def perDocSurprisal(spark: SparkSession, sfDir: String,
      scoreCol: String): DataFrame = {
    val toks = Tables.tokens(spark, sfDir)
    val tf = toks.groupBy("term").agg(count(lit(1)).as("tf"))
    val total = toks.agg(count(lit(1)).as("n_total"))
    toks.join(broadcast(tf), "term")
      .crossJoin(broadcast(total))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"),
        round(avg(log2(col("n_total")) - log2(col("tf"))), 4)
          .as(scoreCol))
  }

  /** Shared CTE chain for the same definition on the DuckDB side:
    * yields `pd(doc_id, n_tok, <scoreCol>)`. */
  private def perDocSurprisalCte(scoreCol: String): String =
    s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
       |  FROM documents),
       |tf AS (SELECT term, count(*) AS tf FROM tok GROUP BY term),
       |tot AS (SELECT count(*) AS n_total FROM tok),
       |pd AS (SELECT doc_id, count(*) AS n_tok,
       |    round(avg(log2(n_total) - log2(tf)), 4) AS $scoreCol
       |  FROM tok JOIN tf USING (term) CROSS JOIN tot
       |  GROUP BY doc_id)""".stripMargin

  def qSurprisal(spark: SparkSession, sfDir: String): DataFrame =
    perDocSurprisal(spark, sfDir, "surprisal").orderBy("doc_id")

  val qSurprisalSql: String =
    s"""${perDocSurprisalCte("surprisal")}
       |SELECT doc_id, n_tok, surprisal FROM pd ORDER BY doc_id""".stripMargin

  // ──────────────────────────── PII scrubbing ────────────────────────────

  private val EmailRe = "[a-z0-9._]+@[a-z0-9.]+[a-z]"
  private val PhoneRe = "\\+1-555-[0-9]{4}"

  /** PII redaction: the corpus is synthetic and clean, so the op plants
    * deterministic PII (an email and a phone derived from doc_id), then
    * scrubs with the redaction regexes and proves the result is
    * PII-free and otherwise text-preserving. Counts per kind make the
    * output auditable.
    */
  def qPiiScrub(spark: SparkSession, sfDir: String): DataFrame = {
    val dirty = concat(col("text"),
      lit(" contact user"), col("doc_id"), lit("@example.com or call "),
      lit("+1-555-"), lpad(col("doc_id") % 10000, 4, "0"))
    val scrubbed = regexp_replace(
      regexp_replace(dirty, EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>")
    Tables.t(spark, sfDir, "documents")
      .withColumn("dirty", dirty)
      .withColumn("scrubbed", scrubbed)
      .select(
        col("doc_id"),
        size(expr(s"regexp_extract_all(dirty, '$EmailRe', 0)"))
          .cast("long").as("n_emails"),
        size(expr(s"regexp_extract_all(dirty, '${PhoneRe.replace("\\", "\\\\")}', 0)"))
          .cast("long").as("n_phones"),
        (size(expr(s"regexp_extract_all(scrubbed, '$EmailRe', 0)")) === 0 &&
          size(expr(s"regexp_extract_all(scrubbed, '${PhoneRe.replace("\\", "\\\\")}', 0)")) === 0)
          .as("pii_free"),
        startswith(col("scrubbed"), col("text")).as("text_preserved"))
      .orderBy("doc_id")
  }

  val qPiiScrubSql: String =
    """WITH d AS (SELECT doc_id, text,
      |    text || ' contact user' || doc_id || '@example.com or call '
      |      || '+1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      |      AS dirty
      |  FROM documents),
      |s AS (SELECT doc_id, text, dirty,
      |    regexp_replace(regexp_replace(dirty,
      |      '[a-z0-9._]+@[a-z0-9.]+[a-z]', '<EMAIL>', 'g'),
      |      '\+1-555-[0-9]{4}', '<PHONE>', 'g') AS scrubbed
      |  FROM d)
      |SELECT doc_id,
      |  len(regexp_extract_all(dirty, '[a-z0-9._]+@[a-z0-9.]+[a-z]'))
      |    AS n_emails,
      |  len(regexp_extract_all(dirty, '\+1-555-[0-9]{4}')) AS n_phones,
      |  len(regexp_extract_all(scrubbed, '[a-z0-9._]+@[a-z0-9.]+[a-z]')) = 0
      |    AND len(regexp_extract_all(scrubbed, '\+1-555-[0-9]{4}')) = 0
      |    AS pii_free,
      |  starts_with(scrubbed, text) AS text_preserved
      |FROM s ORDER BY doc_id""".stripMargin

  // ──────────────────── URL canonicalization dedup ────────────────────

  /** URL dedup: the web-crawl step that collapses scheme/www/tracking/
    * trailing-slash variants of one page. The corpus is synthetic, so a
    * messy URL is planted deterministically per doc (http vs https by
    * parity, WWW. and uppercase host by other residues, a utm_source
    * tracking param, a trailing slash) with doc_id÷2 as the page id —
    * guaranteeing real variant groups. Canonicalization is lower +
    * 4 anchored regex rewrites; dup groups = groupBy(canonical) keeping
    * min(doc_id). Everything before the one canonical-key shuffle is a
    * narrow codegen pass.
    */
  def qDedupUrl(spark: SparkSession, sfDir: String): DataFrame = {
    // page id = doc_id ÷ 2, so docs 2k and 2k+1 are variants of ONE
    // page; host and path derive from the page id alone so the pair
    // really collides after canonicalization.
    val pid = (col("doc_id") / 2).cast("long")
    val host = concat(lit("site"), (pid % 10).cast("string"),
      lit(".example.org"))
    val messy = concat(
      when(col("doc_id") % 2 === 0, "http://").otherwise("https://"),
      when(col("doc_id") % 3 === 0, "WWW.").otherwise(""),
      when(col("doc_id") % 5 === 0, upper(host)).otherwise(host),
      lit("/page/"), pid.cast("string"),
      when(col("doc_id") % 7 === 0, "/").otherwise(""),
      when(col("doc_id") % 2 === 1, "?utm_source=feed").otherwise(""))
    val canonical =
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(lower(messy), "^http://", "https://"),
            "^https://www\\.", "https://"),
          "\\?utm_[a-z]+=[^&]*$", ""),
        "/$", "")
    Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), canonical.as("canonical"))
      .groupBy("canonical")
      .agg(count(lit(1)).as("n"), min("doc_id").as("keep_id"))
      .filter(col("n") >= 2)
      .orderBy("canonical")
  }

  val qDedupUrlSql: String =
    """WITH h AS (SELECT doc_id,
      |    'site' || CAST((doc_id // 2) % 10 AS VARCHAR)
      |      || '.example.org' AS host FROM documents),
      |m AS (SELECT doc_id,
      |    (CASE WHEN doc_id % 2 = 0 THEN 'http://' ELSE 'https://' END)
      |    || (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END)
      |    || (CASE WHEN doc_id % 5 = 0 THEN upper(host) ELSE host END)
      |    || '/page/' || CAST(doc_id // 2 AS VARCHAR)
      |    || (CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END)
      |    || (CASE WHEN doc_id % 2 = 1 THEN '?utm_source=feed' ELSE '' END)
      |    AS url FROM h),
      |c AS (SELECT doc_id,
      |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      |      lower(url),
      |      '^http://', 'https://'),
      |      '^https://www\.', 'https://'),
      |      '\?utm_[a-z]+=[^&]*$', ''),
      |      '/$', '') AS canonical
      |  FROM m)
      |SELECT canonical, count(*) AS n, min(doc_id) AS keep_id
      |FROM c GROUP BY canonical HAVING count(*) >= 2
      |ORDER BY canonical""".stripMargin

  // ──────────────── CCNet-style quality bucketing ────────────────

  /** CCNet-shape quality bucketing: per-language surprisal terciles
    * (bucket 1 = most predictable "head", 3 = noisiest "tail") — the
    * published head/middle/tail split that routes training data by LM
    * quality. Bucket key is round(surprisal, 4) (grid-aligned across
    * engines) with doc_id tiebreak, so ntile is engine-deterministic.
    * Reports order-free exact aggregates per (lang, bucket): doc count,
    * token sum, min/max surprisal. The ntile window partitions by lang —
    * bounded fan-in at any corpus size after the per-doc aggregate.
    */
  def qQualityBucket(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perDoc = perDocSurprisal(spark, sfDir, "s4")
    val byLang = Window.partitionBy("lang").orderBy("s4", "doc_id")
    Tables.t(spark, sfDir, "documents")
      .select("doc_id", "lang")
      .join(perDoc, "doc_id")
      .withColumn("bucket", ntile(3).over(byLang).cast("long"))
      .groupBy("lang", "bucket")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tok"),
        min("s4").as("min_s"), max("s4").as("max_s"))
      .orderBy("lang", "bucket")
  }

  val qQualityBucketSql: String =
    s"""${perDocSurprisalCte("s4")},
      |b AS (SELECT d.lang, pd.n_tok, pd.s4,
      |    ntile(3) OVER (PARTITION BY d.lang
      |      ORDER BY pd.s4, pd.doc_id) AS bucket
      |  FROM documents d JOIN pd USING (doc_id))
      |SELECT lang, CAST(bucket AS BIGINT) AS bucket,
      |  count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tok,
      |  min(s4) AS min_s, max(s4) AS max_s
      |FROM b GROUP BY lang, bucket ORDER BY lang, bucket""".stripMargin
}

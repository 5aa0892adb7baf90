package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Third wave of training-data-pipeline operators (SURVEY.md §2.10d):
  * text normalization, repetition-based quality filtering, stratified
  * sampling, quantile-based length filtering, and vocabulary building.
  *
  * Scale notes: normalize / repetition / sample are narrow per-document
  * passes (plus one hash shuffle for the per-doc tf in repetition);
  * quantile-filter broadcasts two scalar bounds; vocab's running
  * coverage window is bounded by |vocab| (≪ corpus), the same
  * bounded-frame argument as the shard-pack offsets.
  */
object PipelineText {

  // ───────────────────────── text normalization ─────────────────────────

  /** Canonical text cleanup — lowercase, strip non-alphanumerics,
    * collapse runs of whitespace, trim. The corpus is already clean, so
    * the op normalizes a deterministically "dirtied" variant (upper-case
    * + padding + punctuation) and proves the round-trip: one narrow
    * codegen pass, no shuffle except the final sort.
    */
  def qTextNormalize(spark: SparkSession, sfDir: String): DataFrame = {
    val dirty = concat(lit("  "), upper(col("text")), lit("  !! "))
    val norm = trim(regexp_replace(
      regexp_replace(lower(dirty), "[^a-z0-9 ]", ""), " +", " "))
    Tables.t(spark, sfDir, "documents")
      .select(
        col("doc_id"),
        length(dirty).cast("long").as("n_raw"),
        length(norm).cast("long").as("n_norm"),
        (norm === col("text")).as("roundtrip_ok"))
      .orderBy("doc_id")
  }

  val qTextNormalizeSql: String =
    """SELECT doc_id,
      |  length(dirty) AS n_raw,
      |  length(norm) AS n_norm,
      |  norm = text AS roundtrip_ok
      |FROM (SELECT doc_id, text, dirty,
      |    trim(regexp_replace(regexp_replace(lower(dirty),
      |      '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
      |  FROM (SELECT doc_id, text,
      |      '  ' || upper(text) || '  !! ' AS dirty FROM documents))
      |ORDER BY doc_id""".stripMargin

  // ─────────────────── repetition-based quality filter ───────────────────

  /** Per-document repetition metrics — the filter that catches generated
    * or boilerplate text: share of the single most frequent token, and
    * the duplicate-token ratio (1 − unique/total). One tf shuffle keyed
    * on (doc, term), then a per-doc aggregate.
    */
  def qRepetitionFilter(spark: SparkSession, sfDir: String): DataFrame =
    Tables.tokens(spark, sfDir)
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
      .groupBy("doc_id")
      .agg(sum("tf").as("n_tok"),
        max("tf").as("top_tf"),
        count(lit(1)).as("n_unique"))
      .select(col("doc_id"), col("n_tok"),
        round(col("top_tf").cast("double") / col("n_tok"), 4)
          .as("top_share"),
        round(lit(1.0) - col("n_unique").cast("double") / col("n_tok"), 4)
          .as("dup_ratio"),
        (col("top_tf").cast("double") / col("n_tok") >= 0.1)
          .as("repetitive"))
      .orderBy("doc_id")

  val qRepetitionFilterSql: String =
    """WITH tf AS (SELECT doc_id, term, count(*) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |        FROM documents)
      |  GROUP BY doc_id, term),
      |agg AS (SELECT doc_id, sum(tf) AS n_tok, max(tf) AS top_tf,
      |    count(*) AS n_unique
      |  FROM tf GROUP BY doc_id)
      |SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
      |  round(CAST(top_tf AS DOUBLE) / n_tok, 4) AS top_share,
      |  round(1.0 - CAST(n_unique AS DOUBLE) / n_tok, 4) AS dup_ratio,
      |  CAST(top_tf AS DOUBLE) / n_tok >= 0.1 AS repetitive
      |FROM agg ORDER BY doc_id""".stripMargin

  // ───────────────────── stratified deterministic sample ─────────────────

  /** Stratified down-sampling with per-language rates — the corpus
    * re-balancing step of a data mix. The sampling decision is a
    * content-hash bucket (reproducible on any engine / partitioning,
    * same md5 trick as q_split_train); reported per stratum.
    */
  def qSampleStratified(spark: SparkSession, sfDir: String): DataFrame = {
    val bucket = (Tables.md5Bucket(col("text")) % 100).cast("int")
    val rate = when(col("lang") === "en", 10)
      .when(col("lang") === "de", 20)
      .otherwise(50)
    Tables.t(spark, sfDir, "documents")
      .withColumn("sampled", bucket < rate)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("sampled"), 1L).otherwise(0L)).as("n_sampled"))
      .withColumn("pct",
        round(lit(100.0) * col("n_sampled") / col("n_total"), 4))
      .orderBy("lang")
  }

  val qSampleStratifiedSql: String =
    """SELECT lang, count(*) AS n_total,
      |  CAST(sum(CASE WHEN bucket < rate THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_sampled,
      |  round(100.0 * sum(CASE WHEN bucket < rate THEN 1 ELSE 0 END)
      |    / count(*), 4) AS pct
      |FROM (SELECT lang,
      |    CAST(('0x' || substr(md5(text), 1, 15))::BIGINT % 100 AS INT)
      |      AS bucket,
      |    CASE WHEN lang = 'en' THEN 10 WHEN lang = 'de' THEN 20
      |         ELSE 50 END AS rate
      |  FROM documents)
      |GROUP BY lang ORDER BY lang""".stripMargin

  // ───────────────────── quantile length filter ─────────────────────

  /** Keep documents inside the [p10, p90] length band — the outlier trim
    * of a curation pipeline. The two bounds are a single-row aggregate
    * broadcast against the scan (no shuffle of the table itself); both
    * engines filter on the 4-dp-rounded bound so a 1-ulp percentile
    * difference can't flip a row.
    */
  def qQuantileFilter(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.t(spark, sfDir, "documents")
    val bounds = docs.agg(
      round(expr("percentile(n_chars, 0.1)"), 4).as("p10"),
      round(expr("percentile(n_chars, 0.9)"), 4).as("p90"))
    docs.crossJoin(broadcast(bounds))
      .filter(col("n_chars") >= col("p10") && col("n_chars") <= col("p90"))
      .select("doc_id", "n_chars", "p10", "p90")
      .orderBy("doc_id")
  }

  val qQuantileFilterSql: String =
    """WITH b AS (SELECT
      |    round(percentile_cont(0.1) WITHIN GROUP (ORDER BY n_chars), 4)
      |      AS p10,
      |    round(percentile_cont(0.9) WITHIN GROUP (ORDER BY n_chars), 4)
      |      AS p90
      |  FROM documents)
      |SELECT doc_id, n_chars, p10, p90
      |FROM documents, b
      |WHERE n_chars >= p10 AND n_chars <= p90
      |ORDER BY doc_id""".stripMargin

  // ───────────────────────── vocabulary build ─────────────────────────

  /** Corpus vocabulary with a min-count floor and cumulative token
    * coverage — the tokenizer-training prerequisite. The top-100 cut is
    * pushed BELOW the windows (round 8): orderBy+limit compiles to a
    * distributed TakeOrderedAndProject, so the rank/cumsum windows run
    * over exactly 100 rows instead of the whole vocabulary (~10⁸ terms
    * at 100 TB through one task under the round-7 form). The (tf desc,
    * term) order key is unique, so the top-100 ranks and their running
    * shares are identical to the global-window formulation.
    */
  def qTokVocab(spark: SparkSession, sfDir: String): DataFrame = {
    val tf = Tables.tokens(spark, sfDir)
      .groupBy("term").agg(count(lit(1)).as("tf"))
    val total = tf.agg(sum("tf").as("total"))
    val w = Window.orderBy(desc("tf"), asc("term"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tf.filter(col("tf") >= 5)
      .orderBy(desc("tf"), asc("term"))
      .limit(100)
      .crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(
        Window.orderBy(desc("tf"), asc("term"))).cast("long"))
      .withColumn("cum_share",
        round(sum("tf").over(w).cast("double") / col("total"), 4))
      .select("term", "tf", "rank", "cum_share")
      .orderBy("rank")
  }

  val qTokVocabSql: String =
    """WITH tf AS (SELECT term, count(*) AS tf
      |  FROM (SELECT unnest(string_split(text, ' ')) AS term
      |        FROM documents) GROUP BY term),
      |tot AS (SELECT sum(tf) AS total FROM tf)
      |SELECT term, tf,
      |  row_number() OVER (ORDER BY tf DESC, term) AS rank,
      |  round(CAST(sum(tf) OVER (ORDER BY tf DESC, term
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    / (SELECT total FROM tot), 4) AS cum_share
      |FROM tf WHERE tf >= 5
      |ORDER BY rank LIMIT 100""".stripMargin

  // ───────── tokenizer fertility by language (round 6, late) ─────────

  /** Tokenizer fertility per language — tokens-per-word and
    * chars-per-token under the q_token_count tokenizer family (estimated
    * BPE = ceil(chars/4), regex word tokens, whitespace words): the
    * metric that decides whether one tokenizer is acceptable across a
    * multilingual corpus before a 100 TB tokenization run (high-fertility
    * languages inflate training cost and context usage). Per-doc ratios
    * travel as exact integer ppm (the q_ngram_novelty `div` convention),
    * so the per-language means are averages of exact ints with one
    * division onto round(4). Scale: one narrow pass, one bounded-key
    * (|langs|) partial-aggregable shuffle — a pure map stage at any
    * corpus size.
    */
  def qTokFertility(spark: SparkSession, sfDir: String): DataFrame =
    Tables.t(spark, sfDir, "documents")
      .select(col("lang"),
        size(split(col("text"), " ")).cast("long").as("ws"),
        expr("size(regexp_extract_all(text, '[a-z0-9]+', 0))").cast("long")
          .as("re"),
        ceil(length(col("text")).cast("double") / 4).cast("long")
          .as("bpe"),
        length(col("text")).cast("long").as("chars"))
      .select(col("lang"),
        col("ws"), col("bpe"),
        expr("bpe * 1000000 div ws").as("fert_ppm"),
        expr("re * 1000000 div ws").as("word_ppm"),
        expr("chars * 1000000 div bpe").as("cpt_ppm"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("ws").as("n_words"),
        sum("bpe").as("n_tokens"),
        round(avg("fert_ppm"), 4).as("avg_fert_ppm"),
        round(avg("word_ppm"), 4).as("avg_word_ppm"),
        round(avg("cpt_ppm"), 4).as("avg_cpt_ppm"))
      .orderBy("lang")

  val qTokFertilitySql: String =
    """WITH d AS (SELECT lang,
      |    len(string_split(text, ' ')) AS ws,
      |    len(regexp_extract_all(text, '[a-z0-9]+')) AS re,
      |    CAST(ceil(length(text) / 4.0) AS BIGINT) AS bpe,
      |    length(text) AS chars
      |  FROM documents),
      |p AS (SELECT lang, ws, bpe,
      |    bpe * 1000000 // ws AS fert_ppm,
      |    re * 1000000 // ws AS word_ppm,
      |    chars * 1000000 // bpe AS cpt_ppm
      |  FROM d)
      |SELECT lang, count(*) AS n_docs,
      |  CAST(sum(ws) AS BIGINT) AS n_words,
      |  CAST(sum(bpe) AS BIGINT) AS n_tokens,
      |  round(avg(fert_ppm), 4) AS avg_fert_ppm,
      |  round(avg(word_ppm), 4) AS avg_word_ppm,
      |  round(avg(cpt_ppm), 4) AS avg_cpt_ppm
      |FROM p GROUP BY lang ORDER BY lang""".stripMargin

  // ───────── cross-language vocabulary overlap (round 6, late) ─────────

  /** Pairwise vocabulary Jaccard between language slices — the audit
    * that decides whether one tokenizer/vocab can serve a multilingual
    * corpus (high overlap → shared vocab; low → per-language budget).
    * Each language's vocabulary is the distinct-term set of its docs;
    * pairs join on TERM (the vocabulary relation — bounded by |vocab|,
    * never the corpus: the per-lang distinct aggregate is the only pass
    * that sees documents, and it's partial-aggregable). Jaccard is a
    * ratio of exact ints, one division onto round(4); l1 < l2 keys the
    * |langs|² bounded output.
    */
  def qVocabOverlap(spark: SparkSession, sfDir: String): DataFrame = {
    val lv = Tables.t(spark, sfDir, "documents")
      .select(col("lang"), explode(split(col("text"), " ")).as("term"))
      .distinct()
    val sz = lv.groupBy("lang").agg(count(lit(1)).as("sz"))
    val inter = lv.toDF("l1", "term")
      .join(lv.toDF("l2", "t2"),
        col("term") === col("t2") && col("l1") < col("l2"))
      .groupBy("l1", "l2").agg(count(lit(1)).as("inter"))
    inter
      .join(broadcast(sz.toDF("l1", "s1")), "l1")
      .join(broadcast(sz.toDF("l2", "s2")), "l2")
      .select(col("l1"), col("l2"), col("s1"), col("s2"), col("inter"),
        round(col("inter") /
          (col("s1") + col("s2") - col("inter")).cast("double"), 4)
          .as("jaccard"))
      .orderBy("l1", "l2")
  }

  val qVocabOverlapSql: String =
    """WITH lv AS (SELECT DISTINCT lang,
      |    unnest(string_split(text, ' ')) AS term FROM documents),
      |sz AS (SELECT lang, count(*) AS sz FROM lv GROUP BY lang),
      |iv AS (SELECT a.lang AS l1, b.lang AS l2, count(*) AS inter
      |  FROM lv a JOIN lv b ON a.term = b.term AND a.lang < b.lang
      |  GROUP BY a.lang, b.lang)
      |SELECT l1, l2, s1.sz AS s1, s2.sz AS s2, inter,
      |  round(inter / CAST(s1.sz + s2.sz - inter AS DOUBLE), 4)
      |    AS jaccard
      |FROM iv JOIN sz s1 ON s1.lang = l1 JOIN sz s2 ON s2.lang = l2
      |ORDER BY l1, l2""".stripMargin

  // ───────── pairwise Jensen-Shannon divergence between sources ─────────

  /** Pairwise Jensen–Shannon divergence between source unigram
    * distributions — the symmetric, ln2-bounded companion to
    * [[qVocabOverlap]]'s set-Jaccard and q_source_mix_kl's
    * corpus-anchored KL: which source PAIRS are interchangeable in a
    * mixing pass and which carry distinct distributions. Built on the
    * bounded |sources|×|vocab| grid (zero-filled so one-sided terms
    * contribute their exact p·ln2 mass; both-zero cells drop); every
    * ln argument is a ratio of exact BIGINT products
    * (2·c₁N₂/(c₁N₂ + c₂N₁) — the KL ln-of-rationals discipline), and
    * the zero side is CASE-guarded to exact 0 (no 0·ln0 NaN). The
    * pair join runs grid×grid on term — O(|vocab|·|sources|²), corpus
    * documents touched once. Scale: one explode pass, then
    * bounded-relation joins only.
    */
  def qTextJsd(spark: SparkSession, sfDir: String): DataFrame = {
    val st = Tables.t(spark, sfDir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("term"))
      .groupBy("source", "term").agg(count(lit(1)).as("c"))
    val totals = st.groupBy("source").agg(sum("c").as("n"))
    val grid = totals.select("source", "n")
      .crossJoin(st.select("term").distinct())
      .join(st, Seq("source", "term"), "left")
      .select(col("source"), col("term"), col("n"),
        coalesce(col("c"), lit(0L)).as("c"))
    val a = grid.select(col("source").as("s1"), col("term"),
      col("n").as("n1"), col("c").as("c1"))
    val b = grid.select(col("source").as("s2"), col("term"),
      col("n").as("n2"), col("c").as("c2"))
    a.join(b, Seq("term")).filter(col("s1") < col("s2"))
      .filter(col("c1") + col("c2") > 0)
      .groupBy("s1", "s2")
      .agg(round(sum(
        when(col("c1") > 0, (col("c1") / col("n1").cast("double")) *
          log((lit(2L) * col("c1") * col("n2")).cast("double") /
            (col("c1") * col("n2") + col("c2") * col("n1"))))
          .otherwise(0.0) / 2 +
        when(col("c2") > 0, (col("c2") / col("n2").cast("double")) *
          log((lit(2L) * col("c2") * col("n1")).cast("double") /
            (col("c1") * col("n2") + col("c2") * col("n1"))))
          .otherwise(0.0) / 2), 4).as("jsd_nats"),
        sum(when(col("c1") > 0 && col("c2") > 0, 1L).otherwise(0L))
          .as("shared_terms"))
      .orderBy("s1", "s2")
  }

  val qTextJsdSql: String =
    """WITH st AS (SELECT source, term, count(*) AS c
      |  FROM (SELECT source, unnest(string_split(text, ' ')) AS term
      |        FROM documents) GROUP BY source, term),
      |totals AS (SELECT source, sum(c) AS n FROM st GROUP BY source),
      |grid AS (SELECT t.source, v.term, t.n, coalesce(st.c, 0) AS c
      |  FROM totals t CROSS JOIN (SELECT DISTINCT term FROM st) v
      |  LEFT JOIN st ON st.source = t.source AND st.term = v.term)
      |SELECT a.source AS s1, b.source AS s2,
      |  round(sum(
      |    CASE WHEN a.c > 0 THEN (a.c / CAST(a.n AS DOUBLE)) *
      |      ln(CAST(2 * a.c * b.n AS DOUBLE) /
      |        (a.c * b.n + b.c * a.n)) ELSE 0 END / 2 +
      |    CASE WHEN b.c > 0 THEN (b.c / CAST(b.n AS DOUBLE)) *
      |      ln(CAST(2 * b.c * a.n AS DOUBLE) /
      |        (a.c * b.n + b.c * a.n)) ELSE 0 END / 2), 4) AS jsd_nats,
      |  CAST(sum(CASE WHEN a.c > 0 AND b.c > 0 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS shared_terms
      |FROM grid a JOIN grid b ON a.term = b.term AND a.source < b.source
      |WHERE a.c + b.c > 0
      |GROUP BY a.source, b.source ORDER BY s1, s2""".stripMargin

  // ───────── term burstiness (variance-to-mean of per-doc tf) ─────────

  /** Burstiness of the 50 highest-df terms — the variance-to-mean ratio
    * (index of dispersion) of per-document term frequency over the
    * documents CONTAINING the term: content words burst (VMR ≫ 1),
    * function words spread evenly (VMR ≈ 1) — the classic signal
    * separating topical vocabulary from glue, and a template-spam tell
    * when a "content" term shows no burst. Computed from the bounded
    * (doc_id, term) tf relation: per term, df and the exact integer
    * Σtf / Σtf² give mean and variance in closed form ((df·Q − S²)/
    * (df·(df−1)) sample variance) — one division pair onto round(4).
    * Deterministic top-50 by (df desc, term). Scale: one explode pass
    * + a |vocab|-key aggregate + a 50-row limit.
    */
  def qTextBurstiness(spark: SparkSession, sfDir: String): DataFrame =
    Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .groupBy("term")
      .agg(count(lit(1)).as("df"), sum("tf").as("s"),
        sum(col("tf") * col("tf")).as("q"))
      .filter(col("df") >= 2)
      .select(col("term"), col("df"),
        round(col("s") / col("df").cast("double"), 4).as("mean_tf"),
        round(((col("df") * col("q") - col("s") * col("s")) /
          (col("df") * (col("df") - 1L)).cast("double")) /
          (col("s") / col("df").cast("double")), 4).as("vmr"))
      .orderBy(desc("df"), asc("term"))
      .limit(50)

  val qTextBurstinessSql: String =
    """WITH dt AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM dt
      |  GROUP BY doc_id, term),
      |a AS (SELECT term, count(*) AS df, sum(tf) AS s,
      |    sum(tf * tf) AS q
      |  FROM tf GROUP BY term)
      |SELECT term, CAST(df AS BIGINT) AS df,
      |  round(s / CAST(df AS DOUBLE), 4) AS mean_tf,
      |  round(((df * q - s * s) / CAST(df * (df - 1) AS DOUBLE)) /
      |    (s / CAST(df AS DOUBLE)), 4) AS vmr
      |FROM a WHERE df >= 2
      |ORDER BY df DESC, term LIMIT 50""".stripMargin

  // ───────── hapax / lexical-richness audit per source ─────────

  /** Lexical-richness profile per source — token volume, vocabulary
    * size, hapax legomena (terms seen exactly once), and the derived
    * type-token + hapax ratios: the Heaps'-law health check a corpus
    * curator reads before trusting a source's diversity (synthetic or
    * template-generated feeds show collapsed hapax mass; OCR-noise
    * feeds show inflated). One explode pass lands on the bounded
    * (source, term) frequency relation (|sources|×|vocab| — the
    * [[qVocabOverlap]] discipline); everything downstream aggregates
    * that relation. Ratios ship as integer ppm (`div` — exact on both
    * engines). Scale: one partial-aggregable shuffle on (source, term),
    * then a |sources|-key aggregate.
    */
  def qTextHapax(spark: SparkSession, sfDir: String): DataFrame =
    Tables.t(spark, sfDir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("term"))
      .groupBy("source", "term").agg(count(lit(1)).as("tf"))
      .groupBy("source")
      .agg(sum("tf").as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(when(col("tf") === 1L, 1L).otherwise(0L)).as("hapax"))
      .select(col("source"), col("n_tokens"), col("vocab"), col("hapax"),
        expr("vocab * 1000000 div n_tokens").as("ttr_ppm"),
        expr("hapax * 1000000 div vocab").as("hapax_ppm"))
      .orderBy("source")

  val qTextHapaxSql: String =
    """WITH st AS (SELECT source, unnest(string_split(text, ' ')) AS term
      |  FROM documents),
      |tf AS (SELECT source, term, count(*) AS tf FROM st
      |  GROUP BY source, term),
      |a AS (SELECT source, CAST(sum(tf) AS BIGINT) AS n_tokens,
      |    CAST(count(*) AS BIGINT) AS vocab,
      |    CAST(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax
      |  FROM tf GROUP BY source)
      |SELECT source, n_tokens, vocab, hapax,
      |  CAST(vocab * 1000000 // n_tokens AS BIGINT) AS ttr_ppm,
      |  CAST(hapax * 1000000 // vocab AS BIGINT) AS hapax_ppm
      |FROM a ORDER BY source""".stripMargin

  // ───────────── type-token-ratio profile (round 7) ─────────────

  /** Type-token-ratio (lexical diversity) profile: per doc, ttr_ppm =
    * 10⁶·|distinct tokens|/|tokens| (exact integer ppm — the repetition
    * signal the [[qRepetitionFilter]] top-ngram share misses when a doc
    * cycles a LARGE template), then the corpus histogram by TTR decile
    * bucket. Scale: one narrow per-doc pass (split + array_distinct
    * in-row, no token-stream shuffle at all), then a ≤10-key aggregate.
    */
  def qTextTtr(spark: SparkSession, sfDir: String): DataFrame =
    Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("ntok"),
        size(array_distinct(split(col("text"), " "))).cast("long").as("nd"))
      .withColumn("ppm", expr("nd * 1000000 div ntok"))
      .groupBy(expr("ppm div 100000").as("decile"))
      .agg(count(lit(1)).as("n_docs"), sum("ntok").as("sum_tokens"),
        min("ppm").as("min_ppm"), max("ppm").as("max_ppm"))
      .orderBy("decile")

  val qTextTtrSql: String =
    """WITH d AS (SELECT doc_id,
      |    len(string_split(text, ' ')) AS ntok,
      |    len(list_distinct(string_split(text, ' '))) AS nd
      |  FROM documents),
      |b AS (SELECT doc_id, ntok, nd, nd*1000000//ntok AS ppm FROM d)
      |SELECT CAST(ppm//100000 AS BIGINT) AS decile, count(*) AS n_docs,
      |  CAST(sum(ntok) AS BIGINT) AS sum_tokens,
      |  CAST(min(ppm) AS BIGINT) AS min_ppm,
      |  CAST(max(ppm) AS BIGINT) AS max_ppm
      |FROM b GROUP BY 1 ORDER BY 1""".stripMargin

  // ───────── Simpson diversity per source (round 7, wave 2) ─────────

  /** Simpson diversity index per source: 1 − Σc(c−1)/(N(N−1)) over the
    * source's term counts — the probability two random tokens differ,
    * the concentration-robust complement to the entropy and hapax
    * profiles (Simpson weights DOMINANT terms, entropy the full tail).
    * Σc(c−1) is N²-order, so the accumulation is DECIMAL(38,0)-widened
    * (revE4 convention; DuckDB's sum is HUGEINT-exact natively); the
    * single closing division is double, round(6). Scale: one token-
    * stream aggregate to the (source × vocab)-bounded count relation,
    * then a |sources|-key aggregate.
    */
  def qTextSimpson(spark: SparkSession, sfDir: String): DataFrame =
    Tables.t(spark, sfDir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("term"))
      .groupBy("source", "term").agg(count(lit(1)).as("c"))
      .groupBy("source")
      .agg(sum("c").as("n_tokens"), count(lit(1)).as("vocab"),
        sum(col("c").cast("decimal(19,0)") * (col("c") - 1)).as("t"))
      .select(col("source"), col("n_tokens"), col("vocab"),
        round(lit(1.0) - col("t").cast("double") /
          (col("n_tokens").cast("decimal(19,0)") * (col("n_tokens") - 1))
            .cast("double"), 6).as("simpson"))
      .orderBy("source")

  val qTextSimpsonSql: String =
    """WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS term
      |  FROM documents),
      |tc AS (SELECT source, term, count(*) AS c FROM tok
      |  GROUP BY source, term),
      |a AS (SELECT source, sum(c) AS n, count(*) AS vocab,
      |    sum(c * (c - 1)) AS t FROM tc GROUP BY source)
      |SELECT source, CAST(n AS BIGINT) AS n_tokens,
      |  CAST(vocab AS BIGINT) AS vocab,
      |  round(1.0 - t / CAST(n * (n - 1) AS DOUBLE), 6) AS simpson
      |FROM a ORDER BY source""".stripMargin
}

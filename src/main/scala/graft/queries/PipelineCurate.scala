package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-3 training-data curation wave (SURVEY.md §2.10g): boilerplate
  * scoring, temperature-weighted source mixing, BPE pair counts, char
  * entropy, bigram LM, n-gram decontamination, OOV rate, full winnowing.
  *
  * Determinism rules applied throughout (BASELINE hazard list): ratios
  * ship as integer ppm via `div` (never rounded doubles on the .00005
  * grid); DuckDB HUGEINT sums are CAST AS BIGINT; entropy-style log sums
  * follow q_surprisal's round(4) precedent.
  */
object PipelineCurate {

  // ─────────────── boilerplate shingle scoring ───────────────

  /** C4-style boilerplate score: the fraction (ppm) of a doc's distinct
    * 3-token shingles that are "common" (appear in ≥20 docs). Two key
    * shuffles — (doc, shingle) distinct + shingle df — then one rejoin on
    * shingle; never doc×doc. At 100 TB the df side is the small one
    * (vocab-bounded) and broadcasts. The shingle relation is the
    * memoized [[Tables.shingles]] persist: it feeds BOTH plan branches
    * (the df aggregate and the rejoin), so without the cache the
    * explode+distinct ran twice — the round-8 board's slowest row.
    */
  def qBoilerplate(spark: SparkSession, sfDir: String): DataFrame = {
    val sh = Tables.shingles(spark, sfDir).select("doc_id", "sh")
    // Only the COMMON shingles (df ≥ 20 — the boilerplate vocabulary, a
    // tiny fraction of the shingle space) participate in the rejoin:
    // per-doc totals come straight off the cached relation, and the
    // common-set join is a broadcast probe instead of a full
    // |shingles|-row sort-merge. Values are identical to joining the
    // full df table (every shingle has df ≥ 1, so the inner join kept
    // all rows and only the df ≥ 20 flag mattered).
    val common = sh.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 20).select("sh")
    val totals = sh.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    val hits = sh.join(broadcast(common), "sh")
      .groupBy("doc_id").agg(count(lit(1)).as("n_common"))
    totals.join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        expr("(coalesce(n_common, 0) * 1000000) div n_shingles")
          .as("boiler_ppm"))
      .orderBy("doc_id")
  }

  val qBoilerplateSql: String =
    s"""WITH sh AS (SELECT DISTINCT doc_id, sh FROM (
      |    SELECT doc_id, unnest(${Tables.shingles3Sql}) AS sh
      |    FROM (SELECT doc_id, text, string_split(text, ' ') AS arr
      |          FROM documents))),
      |df AS (SELECT sh, count(*) AS df FROM sh GROUP BY sh)
      |SELECT doc_id, count(*) AS n_shingles,
      |  CAST(sum(CASE WHEN df >= 20 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_common,
      |  (CAST(sum(CASE WHEN df >= 20 THEN 1 ELSE 0 END) AS BIGINT)
      |    * 1000000) // count(*) AS boiler_ppm
      |FROM sh JOIN df USING (sh)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ─────────────── temperature-weighted source mixing ───────────────

  /** Temperature sampling across languages (α = 0.5): weight ∝ √n_l,
    * normalized, then per-doc keep decision by content-hash bucket <
    * keep-rate. All arithmetic is integer after one exactly-rounded
    * IEEE sqrt (s = ⌊√(n·10⁶)⌋), so weights are bit-identical on any
    * engine — no FP accumulation anywhere. The per-lang weight table is
    * |langs| rows (broadcast); docs take one narrow hash pass.
    */
  def qMixSample(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.t(spark, sfDir, "documents")
    val counts = docs.groupBy("lang").agg(count(lit(1)).as("n_docs"))
      .withColumn("s", floor(sqrt(col("n_docs") * lit(1000000.0))).cast("long"))
    val z = counts.agg(sum("s").as("z"))
    val tot = docs.agg(count(lit(1)).as("n_total"))
    val rates = counts.crossJoin(broadcast(z)).crossJoin(broadcast(tot))
      .withColumn("weight_ppm", expr("(s * 1000000) div z"))
      .withColumn("keep_ppm",
        least(lit(1000000L), expr("(weight_ppm * n_total) div n_docs")))
      .select("lang", "n_docs", "weight_ppm", "keep_ppm")
    val kept = docs
      .withColumn("bucket",
        Tables.md5Bucket(col("text")) % 1000000L)
      .join(broadcast(rates.select("lang", "keep_ppm")), "lang")
      .filter(col("bucket") < col("keep_ppm"))
      .groupBy("lang").agg(count(lit(1)).as("n_kept"))
    rates.join(kept, Seq("lang"), "left")
      .select(col("lang"), col("n_docs"), col("weight_ppm"), col("keep_ppm"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
      .orderBy("lang")
  }

  val qMixSampleSql: String =
    """WITH c AS (SELECT lang, count(*) AS n_docs,
      |    CAST(floor(sqrt(count(*) * 1000000.0)) AS BIGINT) AS s
      |  FROM documents GROUP BY lang),
      |z AS (SELECT CAST(sum(s) AS BIGINT) AS z FROM c),
      |tot AS (SELECT count(*) AS n_total FROM documents),
      |rates AS (SELECT lang, n_docs, (s * 1000000) // z AS weight_ppm,
      |    least(1000000, ((s * 1000000) // z * n_total) // n_docs)
      |      AS keep_ppm
      |  FROM c CROSS JOIN z CROSS JOIN tot),
      |kept AS (SELECT lang, count(*) AS n_kept
      |  FROM documents JOIN rates USING (lang)
      |  WHERE ('0x' || substr(md5(text), 1, 15))::BIGINT % 1000000
      |    < keep_ppm
      |  GROUP BY lang)
      |SELECT lang, n_docs, weight_ppm, keep_ppm,
      |  coalesce(n_kept, 0) AS n_kept
      |FROM rates LEFT JOIN kept USING (lang) ORDER BY lang""".stripMargin

  // ─────────────── BPE pair counts (tokenizer training step 1) ───────────────

  /** First BPE merge-table step: corpus-weighted counts of adjacent
    * character pairs inside words. Runs over the DISTINCT-term frequency
    * table (vocab-sized, ≪ corpus) — the token stream is aggregated
    * before any per-character work, which is the only formulation that
    * survives 100 TB (chars explode 6× the corpus otherwise).
    */
  def qBpePairs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.tokens(spark, sfDir)
      .groupBy("term").agg(count(lit(1)).as("tf"))
      .filter(length(col("term")) >= 2)
      .select(col("tf"), explode(expr(
        "transform(sequence(1, length(term) - 1), i -> substr(term, i, 2))"))
        .as("pair"))
      .groupBy("pair")
      .agg(sum("tf").as("n"))
      .orderBy(desc("n"), asc("pair"))
      .limit(20)

  val qBpePairsSql: String =
    """WITH tf AS (SELECT term, count(*) AS tf FROM (
      |    SELECT unnest(string_split(text, ' ')) AS term FROM documents)
      |  GROUP BY term),
      |p AS (SELECT substr(term, i, 2) AS pair, tf
      |  FROM tf, unnest(generate_series(1, len(term) - 1)) t(i)
      |  WHERE len(term) >= 2)
      |SELECT pair, CAST(sum(tf) AS BIGINT) AS n
      |FROM p GROUP BY pair ORDER BY n DESC, pair LIMIT 20""".stripMargin

  // ─────────────── per-doc character entropy ───────────────

  /** Shannon entropy of each doc's character distribution (incl. spaces):
    * H = log2(n) − Σ c·log2(c) / n. One (doc, char) shuffle with the
    * per-char counts partial-aggregated map-side; alphabet is bounded so
    * groups are tiny. round(4) per q_surprisal's precedent.
    */
  def qCharEntropy(spark: SparkSession, sfDir: String): DataFrame =
    Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
      .groupBy("doc_id", "ch").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_chars_t"),
        round(log2(sum("c")) - sum(col("c") * log2(col("c"))) / sum("c"), 4)
          .as("entropy"))
      .orderBy("doc_id")

  val qCharEntropySql: String =
    """WITH ch AS (SELECT doc_id, text[i] AS ch
      |  FROM documents, unnest(generate_series(1, len(text))) t(i)),
      |cc AS (SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY doc_id, ch)
      |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_chars_t,
      |  round(log2(CAST(sum(c) AS DOUBLE))
      |    - sum(c * log2(CAST(c AS DOUBLE))) / sum(c), 4) AS entropy
      |FROM cc GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ─────────────── bigram language model ───────────────

  /** Bigram LM head: top-20 bigrams with conditional probability
    * p(w2|w1) in ppm — numerator/denominator both from the bigram count
    * table, so the window that computes the prefix totals runs over the
    * bigram VOCABULARY (≪ corpus), not the token stream.
    */
  def qNgramLm(spark: SparkSession, sfDir: String): DataFrame = {
    val byPrefix = Window.partitionBy("w1")
    Tables.t(spark, sfDir, "documents")
      .withColumn("arr", split(col("text"), " "))
      .select(explode(Tables.bigramsArr(col("arr"))(
        (a, b) => concat(a, lit(" "), b))).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("n"))
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
      .withColumn("n_prefix", sum("n").over(byPrefix))
      .withColumn("cond_ppm", expr("(n * 1000000) div n_prefix"))
      .select("bigram", "n", "n_prefix", "cond_ppm")
      .orderBy(desc("n"), asc("bigram"))
      .limit(20)
  }

  val qNgramLmSql: String =
    """WITH b AS (SELECT arr[i] || ' ' || arr[i+1] AS bigram
      |  FROM (SELECT string_split(text, ' ') AS arr FROM documents),
      |    unnest(generate_series(1, len(arr) - 1)) t(i)),
      |c AS (SELECT bigram, count(*) AS n FROM b GROUP BY bigram),
      |w AS (SELECT bigram, n, split_part(bigram, ' ', 1) AS w1,
      |    CAST(sum(n) OVER (PARTITION BY split_part(bigram, ' ', 1))
      |      AS BIGINT) AS n_prefix
      |  FROM c)
      |SELECT bigram, n, n_prefix, (n * 1000000) // n_prefix AS cond_ppm
      |FROM w ORDER BY n DESC, bigram LIMIT 20""".stripMargin

  // ─────────────── n-gram decontamination fraction ───────────────

  /** Benchmark decontamination: for every training doc (source ≠ src0),
    * the fraction (ppm) of its distinct 3-gram shingles that also occur
    * in the benchmark source (src0). The benchmark shingle set is the
    * small side — broadcast — so the corpus side stays a narrow
    * probe-shaped left join; top-50 most contaminated docs.
    */
  def qDecontamNgram(spark: SparkSession, sfDir: String): DataFrame = {
    val sh = Tables.shingles(spark, sfDir)
    val bench = sh.filter(col("source") === "src0")
      .select("sh").distinct().withColumn("hit", lit(1L))
    sh.filter(col("source") =!= "src0")
      .join(broadcast(bench), Seq("sh"), "left")
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"),
        expr("(sum(coalesce(hit, 0)) * 1000000) div count(1)")
          .as("contam_ppm"))
      .orderBy(desc("contam_ppm"), asc("doc_id"))
      .limit(50)
  }

  val qDecontamNgramSql: String =
    s"""WITH sh AS (SELECT DISTINCT doc_id, source, sh FROM (
      |    SELECT doc_id, source, unnest(${Tables.shingles3Sql}) AS sh
      |    FROM (SELECT doc_id, source, text, string_split(text, ' ') AS arr
      |          FROM documents))),
      |bench AS (SELECT DISTINCT sh, 1 AS hit FROM sh WHERE source = 'src0')
      |SELECT doc_id, source, count(*) AS n_shingles,
      |  CAST(sum(coalesce(hit, 0)) AS BIGINT) AS n_hit,
      |  (CAST(sum(coalesce(hit, 0)) AS BIGINT) * 1000000) // count(*)
      |    AS contam_ppm
      |FROM sh LEFT JOIN bench USING (sh)
      |WHERE source <> 'src0'
      |GROUP BY doc_id, source
      |ORDER BY contam_ppm DESC, doc_id LIMIT 50""".stripMargin

  // ─────────────── OOV rate vs corpus vocabulary ───────────────

  /** Out-of-vocabulary token rate per source against the corpus's own
    * top-1000 vocabulary (tf desc, term asc cutoff). The vocab is
    * vocab-bounded (window over distinct terms only) and broadcasts into
    * a narrow probe join over the token stream.
    */
  def qTokOov(spark: SparkSession, sfDir: String): DataFrame = {
    val vocab = Tables.tokens(spark, sfDir)
      .groupBy("term").agg(count(lit(1)).as("tf"))
      .withColumn("rk", row_number().over(
        Window.orderBy(desc("tf"), asc("term"))))
      .filter(col("rk") <= 1000)
      .select(col("term")).withColumn("in_vocab", lit(1L))
    Tables.tokens(spark, sfDir)
      .join(Tables.t(spark, sfDir, "documents").select("doc_id", "source"),
        "doc_id")
      .join(broadcast(vocab), Seq("term"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_tok"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"),
        expr("(sum(CASE WHEN in_vocab IS NULL THEN 1 ELSE 0 END) * 1000000)" +
          " div count(1)").as("oov_ppm"))
      .orderBy("source")
  }

  val qTokOovSql: String =
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |  FROM documents),
      |vocab AS (SELECT term, 1 AS in_vocab FROM (
      |    SELECT term, row_number() OVER (ORDER BY count(*) DESC, term)
      |      AS rk
      |    FROM tok GROUP BY term) WHERE rk <= 1000)
      |SELECT source, count(*) AS n_tok,
      |  CAST(sum(CASE WHEN in_vocab IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_oov,
      |  (CAST(sum(CASE WHEN in_vocab IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    * 1000000) // count(*) AS oov_ppm
      |FROM tok
      |JOIN documents USING (doc_id)
      |LEFT JOIN vocab USING (term)
      |GROUP BY source ORDER BY source""".stripMargin

  // ─────────────── full winnowing fingerprints ───────────────

  /** Full winnowing (window w = 4 over 3-token shingle hashes): each
    * length-4 hash window contributes its minimum; the doc's fingerprint
    * set is the distinct window minima (MOSS-style — guarantees any ≥6
    * -token match between docs shares a fingerprint). Per-doc windows
    * partition on doc_id, so no global sort; docs with <4 shingles drop
    * out (both engines filter identically).
    */
  def qWinnowFull(spark: SparkSession, sfDir: String): DataFrame = {
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.currentRow, 3)
    Tables.t(spark, sfDir, "documents")
      .withColumn("arr", split(col("text"), " "))
      .select(col("doc_id"),
        posexplode(Tables.shingles3Arr(col("arr"), col("text"))))
      .select(col("doc_id"), col("pos"), md5(col("col")).as("h"))
      .withColumn("wmin", min("h").over(byDoc))
      .withColumn("wlen", count("h").over(byDoc))
      .filter(col("wlen") === 4)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_windows"),
        countDistinct("wmin").as("n_fp"),
        min("wmin").as("min_fp"))
      .orderBy("doc_id")
  }

  val qWinnowFullSql: String =
    s"""WITH sh AS (SELECT doc_id, i AS pos, md5(shs[i]) AS h
      |  FROM (SELECT doc_id, ${Tables.shingles3Sql} AS shs
      |    FROM (SELECT doc_id, text, string_split(text, ' ') AS arr
      |          FROM documents)),
      |    unnest(generate_series(1, len(shs))) t(i)),
      |w AS (SELECT doc_id,
      |    min(h) OVER win AS wmin, count(h) OVER win AS wlen
      |  FROM sh
      |  WINDOW win AS (PARTITION BY doc_id ORDER BY pos
      |    ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING))
      |SELECT doc_id, count(*) AS n_windows,
      |  count(DISTINCT wmin) AS n_fp, min(wmin) AS min_fp
      |FROM w WHERE wlen = 4
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** k-anonymity audit over the (lang, source) quasi-identifier: group
    * sizes plus an at-risk flag for groups smaller than k = 10 — the
    * privacy gate a training-data release runs before shipping. One
    * partial-aggregable groupBy on the bounded QI space; the flag is a
    * scalar post-projection, so the plan is a map-side combine and a
    * QI-sized exchange at any corpus size.
    */
  def qKanon(spark: SparkSession, sfDir: String): DataFrame =
    Tables.t(spark, sfDir, "documents")
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n"))
      .withColumn("at_risk", when(col("n") < 10, 1L).otherwise(0L))
      .orderBy("lang", "source")

  val qKanonSql: String =
    """SELECT lang, source, count(*) AS n,
      |  CAST(CASE WHEN count(*) < 10 THEN 1 ELSE 0 END AS BIGINT)
      |    AS at_risk
      |FROM documents GROUP BY lang, source
      |ORDER BY lang, source""".stripMargin

  /** Curation funnel report: per language, cumulative survivors through
    * the filter chain (length band → repetition floor) plus the final
    * keep rate in integer ppm — the stage-by-stage accounting a
    * pipeline owner reads before shipping a training mix. One narrow
    * metrics pass + one bounded groupBy; stage flags multiply so each
    * column is "survived every stage so far".
    */
  def qCurationFunnel(spark: SparkSession, sfDir: String): DataFrame =
    Tables.t(spark, sfDir, "documents")
      .withColumn("arr", split(col("text"), " "))
      .select(col("lang"), size(col("arr")).as("n_tok"),
        size(array_distinct(col("arr"))).as("n_uniq"))
      .withColumn("pass_len",
        when(col("n_tok").between(30, 5000), 1L).otherwise(0L))
      .withColumn("pass_rep",
        when(col("n_uniq") * 100 >= col("n_tok") * 30, 1L).otherwise(0L))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("pass_len").as("after_len"),
        sum(col("pass_len") * col("pass_rep")).as("after_rep"),
        expr("(sum(pass_len * pass_rep) * 1000000) div count(1)")
          .as("keep_ppm"))
      .orderBy("lang")

  val qCurationFunnelSql: String =
    """WITH d AS (SELECT doc_id, text, lang,
      |    string_split(text, ' ') AS arr FROM documents),
      |m AS (SELECT doc_id, lang, len(arr) AS n_tok,
      |    len(list_distinct(arr)) AS n_uniq FROM d),
      |f AS (SELECT doc_id, lang,
      |    CASE WHEN n_tok BETWEEN 30 AND 5000 THEN 1 ELSE 0 END
      |      AS pass_len,
      |    CASE WHEN n_uniq * 100 >= n_tok * 30 THEN 1 ELSE 0 END
      |      AS pass_rep
      |  FROM m)
      |SELECT lang, count(*) AS n_docs,
      |  CAST(sum(pass_len) AS BIGINT) AS after_len,
      |  CAST(sum(pass_len * pass_rep) AS BIGINT) AS after_rep,
      |  CAST((sum(pass_len * pass_rep) * 1000000) // count(*) AS BIGINT)
      |    AS keep_ppm
      |FROM f GROUP BY lang ORDER BY lang""".stripMargin

  // ───────────── n-gram novelty scoring (round 6, late) ─────────────

  /** Per-source n-gram novelty — the curation metric that separates
    * sources contributing NEW text from sources that restate the corpus
    * (the complement of the [[qDecontamNgram]]/dedup view: instead of
    * dropping repeats, attribute each 3-gram to its first document and
    * score sources by how much they introduce). Shingles travel as their
    * 60-bit md5 fingerprint (the [[graft.Tables.md5Bucket]] winnowing
    * convention — identical in both engines; a long key shuffles ~3×
    * less than the shingle text and collision odds are ~2⁻⁶⁰ per pair).
    * First-seen = min(doc_id) per distinct fingerprint (the generation
    * order the synthetic corpus is ids in); a doc's novelty is the ppm
    * share of its distinct fingerprints it introduced; sources report
    * doc count, shingle sums, and the mean per-doc novelty ppm.
    * Determinism: first-seen is an exact integer min; per-doc ppm is
    * integer `div`; the source mean averages ≤ N exact ints (one
    * division onto round(4)). Scale: shingling is narrow; the
    * first-seen groupBy and the join back are ONE shuffle each on the
    * same long key (co-partitioned hash join, partial-agg min) — no
    * self-join, no corpus-sized window; source rollup is a bounded-key
    * aggregate.
    */
  def qNgramNovelty(spark: SparkSession, sfDir: String): DataFrame = {
    // Distinct-after-hash over the memoized distinct-shingle relation is
    // exactly the old per-doc array_distinct-of-hashes (a multiset and
    // its set hash to the same distinct hash set) — oracle unchanged.
    val sh = Tables.shingles(spark, sfDir)
      .select(col("doc_id"), col("source"),
        Tables.md5Bucket(col("sh")).as("sh"))
      .distinct()
    val first = sh.groupBy("sh").agg(min("doc_id").as("first_doc"))
    sh.join(first, "sh")
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_sh"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .withColumn("novel_ppm", expr("n_novel * 1000000 div n_sh"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_sh").as("n_shingles"),
        sum("n_novel").as("n_novel"),
        round(avg("novel_ppm"), 4).as("avg_novel_ppm"))
      .orderBy("source")
  }

  val qNgramNoveltySql: String =
    s"""WITH d AS (SELECT doc_id, source, text,
      |    string_split(text, ' ') AS arr FROM documents),
      |shl AS (SELECT doc_id, source,
      |    unnest(list_distinct(list_transform(${graft.Tables.shingles3Sql},
      |      s -> ('0x' || substr(md5(s), 1, 15))::BIGINT))) AS sh
      |  FROM d),
      |fs AS (SELECT sh, min(doc_id) AS first_doc FROM shl GROUP BY sh),
      |pd AS (SELECT doc_id, source, count(*) AS n_sh,
      |    sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS n_novel
      |  FROM shl JOIN fs USING (sh) GROUP BY doc_id, source)
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(n_sh) AS BIGINT) AS n_shingles,
      |  CAST(sum(n_novel) AS BIGINT) AS n_novel,
      |  round(avg(n_novel * 1000000 // n_sh), 4) AS avg_novel_ppm
      |FROM pd GROUP BY source ORDER BY source""".stripMargin

  // ───────── source-mix divergence audit (round 6, late) ─────────

  /** Per-source KL divergence of the language distribution against the
    * corpus mix — the audit behind [[qMixSample]]-style re-weighting: a
    * source whose language profile diverges from the target mix is
    * exactly the one a mixing pass must up/down-weight, and KL is the
    * number that ranks them. KL(P_src ‖ P_corpus) = Σ_l p·ln(p/q) with
    * p, q exact count ratios — every ln argument is a ratio of exact
    * BIGINTs ((c_sl·N)/(n_s·c_l)), the sum spans ≤ |langs| terms, and
    * one round(4) lands it (the q_ngram_lm ln-of-rationals precedent).
    * KL ≥ 0 with equality iff the source matches the mix. Scale: two
    * bounded-key aggregates (|src|×|langs|, |langs|) and a broadcast
    * join — a pure map-side shape at any corpus size.
    */
  def qSourceMixKl(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.t(spark, sfDir, "documents").select("source", "lang")
    val sl = d.groupBy("source", "lang").agg(count(lit(1)).as("csl"))
    val l = d.groupBy("lang").agg(count(lit(1)).as("cl"))
    val n = d.agg(count(lit(1)).as("nn"))
    sl.join(broadcast(l), "lang")
      .crossJoin(broadcast(n))
      .withColumn("ns",
        sum("csl").over(Window.partitionBy("source")))
      .groupBy("source")
      .agg(max("ns").as("n_docs"),
        count(lit(1)).as("n_langs"),
        round(sum((col("csl") / col("ns").cast("double")) *
          log((col("csl") * col("nn")) /
            (col("ns") * col("cl")).cast("double"))), 4).as("kl"))
      .select(col("source"), col("n_docs"), col("n_langs"), col("kl"))
      .orderBy("source")
  }

  val qSourceMixKlSql: String =
    """WITH sl AS (SELECT source, lang, count(*) AS csl
      |  FROM documents GROUP BY source, lang),
      |l AS (SELECT lang, count(*) AS cl FROM documents GROUP BY lang),
      |n AS (SELECT count(*) AS nn FROM documents),
      |w AS (SELECT sl.source, sl.lang, sl.csl, l.cl, n.nn,
      |    sum(sl.csl) OVER (PARTITION BY sl.source) AS ns
      |  FROM sl JOIN l USING (lang) CROSS JOIN n)
      |SELECT source, CAST(max(ns) AS BIGINT) AS n_docs,
      |  count(*) AS n_langs,
      |  round(sum((csl / CAST(ns AS DOUBLE)) *
      |    ln((csl * nn) / CAST(ns * cl AS DOUBLE))), 4) AS kl
      |FROM w GROUP BY source ORDER BY source""".stripMargin

  // ───────── lang × source association lift (round 7, wave 6) ─────────

  /** Language × source association lift — observed/expected doc-count
    * ratio in exact integer ppm (lift = n·N / (n_lang·n_source)): the
    * corpus-composition dependence matrix behind sampling-plan design,
    * the effect-size companion to the chi-square independence test.
    * Windows run over the ≤|langs|×|sources| count grid; the N²·10⁶
    * product is DECIMAL-widened (revE4). */
  def qLangLift(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.t(spark, sfDir, "documents")
      .groupBy("lang", "source").agg(count(lit(1)).as("n"))
    c.withColumn("nl", sum("n").over(Window.partitionBy("lang")))
      .withColumn("ns", sum("n").over(Window.partitionBy("source")))
      .withColumn("nn", sum("n").over(Window.partitionBy()))
      .select(col("lang"), col("source"), col("n"),
        expr("CAST(n AS DECIMAL(19,0)) * nn * 1000000 div (nl * ns)")
          .as("lift_ppm"))
      .orderBy("lang", "source")
  }

  val qLangLiftSql: String =
    """WITH c AS (SELECT lang, source, count(*) AS n FROM documents
      |  GROUP BY 1, 2),
      |m AS (SELECT c.lang, c.source, c.n,
      |    sum(n) OVER (PARTITION BY lang) AS nl,
      |    sum(n) OVER (PARTITION BY source) AS ns,
      |    sum(n) OVER () AS nn
      |  FROM c)
      |SELECT lang, source, CAST(n AS BIGINT) AS n,
      |  CAST(n * nn * 1000000 // (nl * ns) AS BIGINT) AS lift_ppm
      |FROM m ORDER BY lang, source""".stripMargin

  // ───────── recency-decay curriculum sampling (round 7, wave 6) ─────────

  /** Recency-weighted deterministic sampling — the curriculum /
    * freshness-bias sampler: keep probability halves per week of age
    * (1000 → 500 → 250 → 125 → 62 ppt, an exact INTEGER lookup — a
    * pow(2, −age/7) double would differ in the last ulp between
    * Math.pow and libm and flip hash-threshold rows), decided by the
    * [[qSplitTrain]] content-hash convention on event_id so the sample
    * is reproducible under re-shuffles. Output: per age week, kept vs
    * total. One narrow pass + bounded-key aggregate.
    */
  def qDecaySample(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_id"),
        expr("datediff(DATE '2024-01-31', CAST(ts AS DATE)) div 7")
          .as("age_wk"),
        (Tables.md5Bucket(col("event_id").cast("string")) % 1000).as("h"))
      .withColumn("keep_ppt",
        expr("""CAST(CASE age_wk WHEN 0 THEN 1000 WHEN 1 THEN 500
                WHEN 2 THEN 250 WHEN 3 THEN 125 ELSE 62 END AS BIGINT)"""))
      .groupBy("age_wk")
      .agg(max("keep_ppt").as("keep_ppt"), count(lit(1)).as("n_events"),
        sum(when(col("h") < col("keep_ppt"), 1L).otherwise(0L))
          .as("n_sampled"))
      .orderBy("age_wk")

  /** Corpus conditional bigram entropy H(w₂|w₁) and its perplexity —
    * the order-1 language-model floor: how predictable the next token
    * is given the previous one, THE corpus statistic behind LM
    * perplexity expectations and compression bounds (complements
    * [[qNgramLm]]'s per-sequence scoring with the corpus-level rate).
    * Bigrams expand in-row via the shared [[Tables.bigramsArr]] zip
    * (no self-join); the entropy sum runs over the ≤vocab²-bounded
    * bigram grid (916 cells here — the q_source_mix_kl precedent for
    * grid-bounded ln sums at round(4)), with ONE final division and
    * exp. */
  def qBigramEntropy(spark: SparkSession, sfDir: String): DataFrame = {
    val bg = Tables.t(spark, sfDir, "documents")
      .select(explode(Tables.bigramsArr(split(col("text"), " "))(
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c"))
    // left-context totals as a w1-keyed window over the aggregated
    // bigram counts (round 12): the groupBy+join form consumed `bg`
    // twice, re-running the corpus bigram explode+count per consumer;
    // the window shuffles only the already-aggregated (w1, w2, c)
    // relation, partitioned on the vocabulary-bounded w1
    bg.withColumn("n1",
        sum("c").over(org.apache.spark.sql.expressions.Window
          .partitionBy("w1")))
      .agg(sum("c").as("n"), count(lit(1)).as("n_bigrams"),
        sum(col("c") * log(col("c") / col("n1").cast("double"))).as("s"))
      .select(col("n").as("n_tokens_bg"),
        col("n_bigrams").as("distinct_bigrams"),
        round(-col("s") / col("n"), 4).as("cond_entropy_nats"),
        round(exp(-col("s") / col("n")), 4).as("perplexity"))
      .orderBy("n_tokens_bg")
  }

  val qBigramEntropySql: String =
    """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS arr
      |  FROM documents),
      |bg AS (SELECT arr[CAST(i AS INTEGER)] AS w1,
      |    arr[CAST(i AS INTEGER) + 1] AS w2
      |  FROM tok, unnest(generate_series(1, len(arr) - 1)) t(i)),
      |c12 AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY 1, 2),
      |c1 AS (SELECT w1, sum(c) AS n1 FROM c12 GROUP BY w1),
      |a AS (SELECT sum(c) AS n, count(*) AS n_bigrams,
      |    sum(c * ln(c / CAST(n1 AS DOUBLE))) AS s
      |  FROM c12 JOIN c1 USING (w1))
      |SELECT CAST(n AS BIGINT) AS n_tokens_bg,
      |  CAST(n_bigrams AS BIGINT) AS distinct_bigrams,
      |  round(-s / n, 4) AS cond_entropy_nats,
      |  round(exp(-s / n), 4) AS perplexity
      |FROM a ORDER BY n_tokens_bg""".stripMargin

  val qDecaySampleSql: String =
    """WITH e AS (SELECT event_id,
      |    CAST(date_diff('day', CAST(ts AS DATE), DATE '2024-01-31') // 7
      |      AS BIGINT) AS age_wk,
      |    CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))
      |      ::BIGINT % 1000 AS BIGINT) AS h
      |  FROM events),
      |w AS (SELECT *, CASE age_wk WHEN 0 THEN 1000 WHEN 1 THEN 500
      |    WHEN 2 THEN 250 WHEN 3 THEN 125 ELSE 62 END AS keep_ppt
      |  FROM e)
      |SELECT age_wk, CAST(max(keep_ppt) AS BIGINT) AS keep_ppt,
      |  count(*) AS n_events,
      |  CAST(sum(CASE WHEN h < keep_ppt THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_sampled
      |FROM w GROUP BY age_wk ORDER BY age_wk""".stripMargin
}

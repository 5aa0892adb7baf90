package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Second wave of training-data-pipeline operators (SURVEY.md §2.10b):
  * shingle-level (n-gram) Jaccard near-dup, random-hyperplane LSH
  * bucketing for cosine ANN, and embedding normalization/quantization.
  *
  * Scale notes: all three follow the sketch-then-bucket discipline — the
  * only joins are on shingle/bucket keys, never raw-text or all-pairs
  * cross joins — AND the candidate OUTPUT volume (not just the shuffle
  * count) is bounded: hot shingles are df-capped ([[ShingleDfCap]]) and
  * oversize hyperplane buckets are sub-split ([[VecBucketCap]]), so
  * Σ key-group² stays linear in the corpus instead of quadratic.
  */
object PipelineExtra {

  // ───────────────────── n-gram (shingle) Jaccard dedup ─────────────────

  /** Hot-shingle guard (round 11, verdict item #1): a shingle shared by
    * more than this many docs is boilerplate ("all rights reserved" on a
    * 100× web corpus), carries no dedup signal, and would mint df²
    * candidate pairs in the shingle-keyed self-join. Shingles with
    * df > cap are dropped from the shingle SETS entirely — sizes and
    * intersections alike, so the reported Jaccard/containment stays
    * internally consistent (it becomes "similarity over the df ≤ cap
    * shingle sets", the standard containment-sketch stopword move).
    * Candidate volume bound: Σ_sh df(sh)² ≤ (Σ_sh df(sh))·cap — linear
    * in the corpus with the cap as the constant. Provably inactive at
    * tested SFs: max df is 6 at sf0.1 (4 at sf0.001, 3 at sf0.01) vs
    * cap 128, so every shingle survives and results are unchanged; the
    * capped path is exercised by SkewJoinSpec's synthetic hot-shingle
    * corpus. The SAME df-cap is mirrored in the DuckDB oracle SQL of
    * both consumers, so engines cannot fork even at an SF where the
    * cap activates. */
  private[graft] val ShingleDfCap = 128L

  /** The shared doc_id%10 shingle sample with the [[ShingleDfCap]]
    * guard applied at `cap` — factored so the spec can drive the capped
    * path with a synthetic hot shingle and a tiny cap. One df aggregate
    * + one sh-keyed join over the cached shingle relation. */
  private[graft] def cappedShingles(sh: DataFrame, cap: Long): DataFrame = {
    val df = sh.groupBy("sh").agg(count(lit(1)).as("df"))
    sh.join(df, Seq("sh")).filter(col("df") <= cap).select("doc_id", "sh")
  }

  // The capped sample feeds q_dedup_ngram AND q_dedup_contain (and each
  // bench run re-executes its df aggregate + join) — persist once per
  // (session, sfDir), the Tables.tokens discipline. Registered with the
  // round-11 cache lifecycle so clearCaches() releases it.
  private val sampleShingleCache = Tables.registerCache()

  private def sampleShingles(spark: SparkSession, sfDir: String): DataFrame = {
    val key = s"${spark.sparkContext.applicationId}:$sfDir"
    Tables.memo(sampleShingleCache, key)(
      cappedShingles(
        Tables.shingles(spark, sfDir)
          .filter(col("doc_id") % 10 === 0).select("doc_id", "sh"),
        ShingleDfCap).persist())
  }

  /** DuckDB mirror of [[sampleShingles]] — `shf(doc_id, sh)` after the
    * df-cap; interpolate after `WITH `. */
  private val shfCte: String =
    s"""sh AS (SELECT DISTINCT doc_id, sh FROM
      |  (SELECT doc_id, unnest(${Tables.shingles3Sql}) AS sh
      |   FROM (SELECT doc_id, text, string_split(text, ' ') AS arr
      |         FROM documents WHERE doc_id % 10 = 0))),
      |shf AS (SELECT doc_id, sh FROM sh JOIN
      |  (SELECT sh FROM sh GROUP BY sh HAVING count(*) <= $ShingleDfCap)
      |  USING (sh))""".stripMargin

  /** Near-dup by 3-token-shingle Jaccard over the shared doc_id%10 sample
    * (complements q_dedup_near's token-SET Jaccard: shingles see word
    * order, so reordered near-identical docs score lower). Top-20 pairs.
    */
  def qDedupNgram(spark: SparkSession, sfDir: String): DataFrame = {
    val sh = sampleShingles(spark, sfDir)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val a = sh.toDF("d1", "sh")
    val b = sh.toDF("d2", "sh")
    a.join(b, Seq("sh")).filter(col("d1") < col("d2"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("inter"))
      .join(sizes.toDF("d1", "n1"), "d1")
      .join(sizes.toDF("d2", "n2"), "d2")
      .select(col("d1"), col("d2"),
        round(col("inter") /
          (col("n1") + col("n2") - col("inter")), 4).as("jaccard"))
      .orderBy(desc("jaccard"), asc("d1"), asc("d2"))
      .limit(20)
  }

  val qDedupNgramSql: String =
    s"""WITH $shfCte,
      |sz AS (SELECT doc_id, count(*) AS n FROM shf GROUP BY doc_id),
      |pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
      |  FROM shf a JOIN shf b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id)
      |SELECT d1, d2,
      |  round(inter / (s1.n + s2.n - inter), 4) AS jaccard
      |FROM pairs JOIN sz s1 ON d1 = s1.doc_id JOIN sz s2 ON d2 = s2.doc_id
      |ORDER BY jaccard DESC, d1, d2 LIMIT 20""".stripMargin

  // ─────────────────── random-hyperplane LSH for cosine ─────────────────

  private val Planes = 8

  /** Deterministic integer "random" hyperplane weight for (plane p,
    * 1-based dim d) — identical arithmetic on both engines, no RNG.
    * Materialized as a literal array (up to [[MaxDim]] dims; ArrayDot
    * truncates to the vector's length) instead of a per-row
    * `transform(sequence(...))`: the former is one codegen'd dot over a
    * constant, the latter built 8 weight arrays per row through
    * interpreted higher-order lambdas and bloated the generated code
    * (~3 s of one-shot codegen at bench time). */
  private val MaxDim = 512
  private def planeVec(p: Int): Array[Double] =
    Array.tabulate(MaxDim)(i => (((p * 31 + (i + 1) * 17) % 7) - 3).toDouble)

  /** 8-bit sign-of-projection LSH bucket key for a double-vector column —
    * shared by q_sim_lsh (the ANN scale path) and q_ann_recall (its
    * recall audit). */
  private[queries] def lshBucket(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat((0 until Planes).map { p =>
      val dot = graft.functions.VectorOps.dot(v, typedLit(planeVec(p)))
      when(dot >= 0, lit("1")).otherwise(lit("0"))
    }: _*)

  /** Mega-bucket guard for the fixed-256-key hyperplane bucket space
    * (round 11, verdict item #1): with 8 planes the bucket count never
    * exceeds 2⁸, so at 100× corpus the per-bucket population grows
    * linearly and an uncapped within-bucket self-join mints O(n²/256)
    * candidate rows. Buckets larger than the cap are deterministically
    * sub-split by a content hash of vec_id (the [[PipelinePlus.bandedPairs]]
    * discipline): Σ bucket² ≤ (Σ B)·cap — linear in the corpus. Pairs
    * straddling sub-buckets are dropped (standard LSH recall trade).
    * Provably inactive at tested SFs: max bucket 83 at sf0.1 (24 at
    * sf0.001, 19 at sf0.01) vs cap 256 ⇒ every salt divisor is 1 and
    * the join degenerates to the plain bucket equi-join; the split path
    * is exercised by SkewJoinSpec's synthetic mega-bucket vectors. The
    * SAME formula is mirrored in [[qSimLshSql]], so engines cannot fork
    * even at an SF where the cap activates. */
  private[graft] val VecBucketCap = 256L

  /** Within-bucket cosine pairs (v1 < v2) of a signature relation
    * (vec_id, v, n, bucket), with the [[VecBucketCap]]-style sub-split
    * applied at `cap`. Factored out so the spec can drive it with a
    * synthetic mega-bucket and a tiny cap. */
  private[graft] def bucketCosPairs(sig: DataFrame, cap: Long): DataFrame = {
    val sizes = sig.groupBy("bucket").agg(count(lit(1)).as("bsz"))
    val salted = sig.join(sizes, Seq("bucket"))
      .withColumn("salt",
        Tables.md5Bucket(concat(lit("subv:"), col("vec_id"))) %
          greatest(lit(1L), expr(s"(bsz + ${cap - 1}) div $cap")))
    val a = salted.select(col("vec_id").as("v1"), col("v").as("va"),
      col("n").as("na"), col("bucket"), col("salt"))
    val b = salted.select(col("vec_id").as("v2"), col("v").as("vb"),
      col("n").as("nb"), col("bucket"), col("salt"))
    a.join(b, Seq("bucket", "salt")).filter(col("v1") < col("v2"))
      .select(col("v1"), col("v2"), col("bucket"),
        round(graft.functions.VectorOps.dot(col("va"), col("vb")) /
          (col("na") * col("nb")), 4)
          .as("cos"))
  }

  /** LSH-bucketed cosine near-dup: 8 sign-of-projection bits form the
    * bucket key; exact cosine is computed only within buckets (the scale
    * path for q_dedup_embed's sampled brute force — candidate count drops
    * from O(n²) to O(Σ bucket²), with Σ bucket² kept linear by the
    * [[VecBucketCap]] sub-split). Top-20 pairs by cosine.
    */
  def qSimLsh(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.t(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    val sig = e.withColumn("bucket", lshBucket(col("v")))
      .withColumn("n", graft.functions.VectorOps.l2norm(col("v")))
    bucketCosPairs(sig, VecBucketCap)
      .orderBy(desc("cos"), asc("v1"), asc("v2"))
      .limit(20)
  }

  val qSimLshSql: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      |  FROM embeddings),
      |sig AS (SELECT vec_id,
      |    string_agg(CASE WHEN dot >= 0 THEN '1' ELSE '0' END, ''
      |               ORDER BY p) AS bucket
      |  FROM (SELECT vec_id, p,
      |      sum(v[d] * (((p * 31 + d * 17) % 7) - 3)) AS dot
      |    FROM e, unnest(generate_series(0, 7)) t1(p),
      |      unnest(generate_series(1, len(v))) t2(d)
      |    GROUP BY vec_id, p)
      |  GROUP BY vec_id),
      |bsz AS (SELECT bucket, count(*) AS bsz FROM sig GROUP BY bucket),
      |bsalt AS (SELECT vec_id, bucket,
      |    ('0x' || substr(md5('subv:' || vec_id), 1, 15))::BIGINT
      |      % greatest(1, (bsz + ${VecBucketCap - 1}) // $VecBucketCap)
      |      AS salt
      |  FROM sig JOIN bsz USING (bucket))
      |SELECT a.vec_id AS v1, b.vec_id AS v2, sa.bucket,
      |  round(CAST(list_cosine_similarity(a.embedding, b.embedding)
      |    AS DOUBLE), 4) AS cos
      |FROM embeddings a JOIN bsalt sa ON a.vec_id = sa.vec_id
      |JOIN bsalt sb ON sa.bucket = sb.bucket AND sa.salt = sb.salt
      |  AND sa.vec_id < sb.vec_id
      |JOIN embeddings b ON b.vec_id = sb.vec_id
      |ORDER BY cos DESC, v1, v2 LIMIT 20""".stripMargin

  // ─────────────── embedding normalization / quantization ───────────────

  /** Unit-L2 normalization + int8 quantization of every embedding — the
    * standard pre-index transform for an ANN store (4 bytes → 1 byte per
    * dim). One narrow codegen pass, no shuffle except the final sort.
    * The int8 vector ships comma-joined (the driver comparator can't
    * hash raw array cells); the array-typed form stays in PipelineSpec.
    */
  def qEmbedNorm(spark: SparkSession, sfDir: String): DataFrame =
    Tables.t(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("l2_norm", graft.functions.VectorOps.l2norm(col("v")))
      .select(col("vec_id"), col("label"),
        round(col("l2_norm"), 4).as("l2_norm"),
        array_join(transform(col("v"),
            x => round(x * 127 / col("l2_norm"), 0).cast("int")
              .cast("string")), ",").as("quant"))
      .orderBy("vec_id")

  val qEmbedNormSql: String =
    """SELECT vec_id, label, round(l2_norm, 4) AS l2_norm,
      |  array_to_string(list_transform(v,
      |    x -> CAST(round(x * 127 / l2_norm, 0) AS INT)), ',') AS quant
      |FROM (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
      |    sqrt(list_aggregate(list_transform(CAST(embedding AS DOUBLE[]),
      |      x -> x * x), 'sum')) AS l2_norm
      |  FROM embeddings)
      |ORDER BY vec_id""".stripMargin

  // ─────────────── deterministic train/val/test split ───────────────

  /** Content-hash split into train/val/test (80/10/10). Hashing CONTENT
    * (not doc_id) keeps exact duplicates in the same split — the property
    * that stops train/test leakage — and is reproducible on any engine /
    * any partitioning. Same md5→int trick as the SimHash sketch.
    */
  def qSplitTrain(spark: SparkSession, sfDir: String): DataFrame =
    Tables.t(spark, sfDir, "documents")
      .withColumn("bucket",
        (Tables.md5Bucket(col("text")) % 100).cast("int"))
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val")
          .otherwise("test"))
      .select("doc_id", "lang", "bucket", "split")
      .orderBy("doc_id")

  val qSplitTrainSql: String =
    """SELECT doc_id, lang, bucket,
      |  CASE WHEN bucket < 80 THEN 'train'
      |       WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
      |FROM (SELECT doc_id, lang,
      |    CAST(('0x' || substr(md5(text), 1, 15))::BIGINT % 100 AS INT)
      |      AS bucket
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** K-fold cross-validation assignment audit (k = 5): folds from the
    * SAME content-hash bucketing as [[qSplitTrain]] (stable under
    * re-shuffles and re-ingests — a row-number fold would reassign docs
    * whenever upstream order changes), with per-fold size and language
    * coverage so a skewed fold is caught before training. One narrow
    * hash pass + a 5-key aggregate.
    */
  def qKfold(spark: SparkSession, sfDir: String): DataFrame =
    Tables.t(spark, sfDir, "documents")
      .withColumn("fold", Tables.md5Bucket(col("text")) % 5)
      .groupBy("fold")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct("lang").as("n_langs"),
        min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
      .orderBy("fold")

  val qKfoldSql: String =
    """WITH f AS (SELECT doc_id, lang,
      |    CAST(('0x' || substr(md5(text), 1, 15))::BIGINT % 5 AS BIGINT)
      |      AS fold
      |  FROM documents)
      |SELECT fold, count(*) AS n_docs,
      |  count(DISTINCT lang) AS n_langs,
      |  CAST(min(doc_id) AS BIGINT) AS min_doc,
      |  CAST(max(doc_id) AS BIGINT) AS max_doc
      |FROM f GROUP BY fold ORDER BY fold""".stripMargin

  // ─────────────── cross-source contamination check ───────────────

  /** Benchmark-contamination scan: winnowing fingerprints (min-md5 over
    * 3-token shingles) colliding ACROSS sources — the "did my training
    * source copy my eval source" join. Counts per source pair; the join
    * key is the fingerprint, so cost is one hash shuffle of |docs| rows.
    */
  def qContamination(spark: SparkSession, sfDir: String): DataFrame = {
    // min-over-shingle-hashes comes from the memoized [[Tables.shingles]]
    // relation (min over the distinct set = min over the multiset): the
    // per-doc groupBy is one key shuffle over CACHED rows, amortized with
    // the ≥6 other consumers of the same persist. (History: a standalone
    // narrow array_min(transform) pass was faster than re-exploding per
    // query — 0.45 s vs 6.5 s at sf0.1 — but the shared cache beats both
    // once any sibling query has materialized it.)
    val fp = Tables.shingles(spark, sfDir)
      .groupBy("doc_id", "source")
      .agg(min(md5(col("sh"))).as("fp"))
    // Each doc carries exactly ONE fingerprint, so the doc×doc collision
    // join collapses to arithmetic over per-(fp, source) counts:
    //   n_collisions(s1,s2) = Σ_fp c1·c2   (pair count)
    //   n_docs_i(s1,s2)     = Σ_fp c_i     (distinct docs = one fp each)
    // The naive doc-level self-join is quasi-quadratic when fingerprints
    // are skewed (this corpus: tiny vocabulary ⇒ heavy fp collisions) and
    // needs an Expand for the two countDistincts. A fp-keyed SELF-join of
    // the counts would fix that but still evaluates the fingerprint scan
    // twice (the broadcast side defeats exchange reuse — measured 4.4 s
    // vs 0.45 s cached at sf0.1); instead the source-pairs per fp are
    // generated in-array from one collect_list (≤ |sources|² elements),
    // so the whole query is a single pass over documents.
    val g = fp.groupBy("fp", "source").agg(count(lit(1)).as("c"))
    g.groupBy("fp")
      .agg(collect_list(struct(col("source"), col("c"))).as("ss"))
      .select(explode(flatten(transform(col("ss"), x =>
        filter(
          transform(col("ss"), y => struct(
            x("source").as("src1"), y("source").as("src2"),
            x("c").as("c1"), y("c").as("c2"))),
          p => p("src1") < p("src2"))))).as("p"))
      .groupBy(col("p.src1").as("src1"), col("p.src2").as("src2"))
      .agg(sum(col("p.c1") * col("p.c2")).as("n_collisions"),
        sum(col("p.c1")).as("n_docs_1"),
        sum(col("p.c2")).as("n_docs_2"))
      .orderBy("src1", "src2")
  }

  val qContaminationSql: String =
    s"""WITH fp AS (SELECT doc_id, source, min(md5(sh)) AS fp
      |  FROM (SELECT doc_id, source, unnest(${Tables.shingles3Sql}) AS sh
      |    FROM (SELECT doc_id, source, text, string_split(text, ' ') AS arr
      |          FROM documents))
      |  GROUP BY doc_id, source)
      |SELECT a.source AS src1, b.source AS src2,
      |  count(*) AS n_collisions,
      |  count(DISTINCT a.doc_id) AS n_docs_1,
      |  count(DISTINCT b.doc_id) AS n_docs_2
      |FROM fp a JOIN fp b ON a.fp = b.fp AND a.source < b.source
      |GROUP BY src1, src2 ORDER BY src1, src2""".stripMargin

  // ─────────────── token-budget shard packing ───────────────

  /** Pack documents into training shards of ≈2000 tokens by running
    * token count (shard boundary when the budget fills). Scale-safe
    * two-pass plan instead of a global unpartitioned window (which
    * funnels the whole table through ONE partition for the sort):
    * deterministic range buckets on doc_id → per-bucket token totals
    * (tiny: one row per bucket) → prefix offsets over those totals →
    * broadcast back → per-bucket running sum + offset. The running sum
    * window is partitioned, so every partition sorts only its own
    * range; output is bit-identical to the global cumulative sum.
    */
  def qShardPack(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val P = 32
    val base = Tables.t(spark, sfDir, "documents")
      .withColumn("ntok", size(split(col("text"), " ")).cast("long"))
      .select("doc_id", "ntok")
    // deterministic range bucket: pid = doc_id * P / (max_id + 1).
    // (At corpus scale the same single-row max aggregate broadcasts.)
    val mx = base.agg(max("doc_id").as("mx"))
    val withPid = base.crossJoin(broadcast(mx))
      .withColumn("pid", (col("doc_id") * P / (col("mx") + 1)).cast("int"))
      .drop("mx")
    // prefix offset per bucket: ≤ P rows, so the unpartitioned window
    // here is a driver-sized frame, not a data-sized one
    val wOff = Window.orderBy("pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withPid.groupBy("pid").agg(sum("ntok").as("ptok"))
      .withColumn("off", coalesce(sum("ptok").over(wOff), lit(0L)))
      .select("pid", "off")
    val w = Window.partitionBy("pid").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withPid.join(broadcast(offsets), "pid")
      .withColumn("cum", col("off") + sum("ntok").over(w))
      .select(col("doc_id"), col("ntok"),
        ((col("cum") - col("ntok")) / 2000L).cast("long").as("shard"))
      .orderBy("doc_id")
  }

  val qShardPackSql: String =
    """SELECT doc_id, ntok,
      |  CAST(floor((cum - ntok) / 2000) AS BIGINT) AS shard
      |FROM (SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok,
      |    sum(CAST(len(string_split(text, ' ')) AS BIGINT))
      |      OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND
      |            CURRENT ROW) AS cum
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** CONTAINMENT near-dup (round 3): directional |A∩B|/|A| over 3-token
    * shingle sets — catches a doc that is a SUBSET of a larger one,
    * which symmetric Jaccard (q_dedup_ngram) dilutes below threshold.
    * Same scale shape as q_dedup_ngram: candidates pair only through a
    * shared-shingle equi-join (never doc×doc); directional, so d1 != d2
    * with both orientations kept — (small ⊂ big) scores high only in
    * the small→big direction. Top-20 by containment. Hot shingles are
    * df-capped before pairing ([[ShingleDfCap]] — provably inactive at
    * tested SFs, mirrored in the oracle).
    */
  def qDedupContain(spark: SparkSession, sfDir: String): DataFrame = {
    val sh = sampleShingles(spark, sfDir)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val a = sh.toDF("d1", "sh")
    val b = sh.toDF("d2", "sh")
    a.join(b, Seq("sh")).filter(col("d1") =!= col("d2"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("inter"))
      .join(sizes.toDF("d1", "n1"), "d1")
      .select(col("d1"), col("d2"), col("inter"), col("n1"),
        round(col("inter") / col("n1"), 4).as("containment"))
      .orderBy(desc("containment"), asc("d1"), asc("d2"))
      .limit(20)
  }

  val qDedupContainSql: String =
    s"""WITH $shfCte,
      |sz AS (SELECT doc_id, count(*) AS n FROM shf GROUP BY doc_id),
      |pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
      |  FROM shf a JOIN shf b ON a.sh = b.sh AND a.doc_id <> b.doc_id
      |  GROUP BY a.doc_id, b.doc_id)
      |SELECT d1, d2, inter, s1.n AS n1,
      |  round(inter / s1.n, 4) AS containment
      |FROM pairs JOIN sz s1 ON d1 = s1.doc_id
      |ORDER BY containment DESC, d1, d2 LIMIT 20""".stripMargin

  // ───────── prefix-filtered exact similarity join (PPJoin-lite) ─────────

  /** Exact-threshold set-similarity join with prefix filtering (the
    * PPJoin/AllPairs family, public VLDB canon): ALL doc pairs in the
    * §2.10 shared sample with token-set Jaccard ≥ 0.6 — exactly, not
    * probabilistically. Candidates come ONLY from the prefix: with a
    * global rarity order on the vocabulary, two sets at Jaccard ≥ t must
    * share a token among each set's first |d| − ⌈t·|d|⌉ + 1 rarest
    * tokens, so only those tokens enter the candidate self-join — the
    * join is keyed on the RAREST slice of the vocabulary, which is
    * precisely where df (and hence bucket size) is smallest. Exact
    * Jaccard is then verified on candidates only. Complements
    * q_dedup_minhash (probabilistic, recall < 1) and q_dedup_ngram
    * (every shared shingle generates candidates) with an exact-recall
    * threshold join that still never goes all-pairs. Exactness: the
    * prefix length uses ⌈3·sz/5⌉ = (3·sz + 4) div 5 (pure ints — a
    * float 0.6·sz would sit on ULP boundaries), the ≥ 0.6 test is
    * 5·inter ≥ 3·union in ints, and the reported similarity is integer
    * ppm. Scale: df ranking is a |vocab|-bounded window; per-doc prefix
    * selection is one row_number window on the doc_id shuffle key;
    * verification is candidate-bounded.
    */
  def qSimjoinPrefix(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = PipelinePlus.sampleTerms(spark, sfDir)
    val ranked = terms.groupBy("term").agg(count(lit(1)).as("df"))
      .withColumn("trank",
        row_number().over(Window.orderBy(asc("df"), asc("term"))))
      .select("term", "trank")
    // lazy checkpoints (round 12): sizes feeds THREE consumers (the
    // prefix build + both final margins) and the prefix relation feeds
    // BOTH self-join sides — unchecked, each consumer re-ran the
    // groupBy / rank-window chain over the cached sample terms
    val sizes = terms.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      .localCheckpoint(false)
    val prefix = terms
      .join(broadcast(ranked), "term")
      .join(sizes, "doc_id")
      .withColumn("pos",
        row_number().over(Window.partitionBy("doc_id").orderBy("trank")))
      .filter(col("pos") <= col("sz") - expr("(3 * sz + 4) DIV 5") + 1)
      .select("doc_id", "term")
      .localCheckpoint(false)
    val cand = prefix.toDF("d1", "term")
      .join(prefix.toDF("d2", "term"), "term")
      .filter(col("d1") < col("d2"))
      .select("d1", "d2").distinct()
    val inter = cand
      .join(terms.toDF("d1", "term"), "d1")
      .join(terms.toDF("d2", "term"), Seq("d2", "term"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.toDF("d1", "n1"), "d1")
      .join(sizes.toDF("d2", "n2"), "d2")
      .filter(col("inter") * 5 >= (col("n1") + col("n2") - col("inter")) * 3)
      .select(col("d1"), col("d2"), col("inter"),
        expr("CAST(inter * 1000000 DIV (n1 + n2 - inter) AS BIGINT)")
          .as("jaccard_ppm"))
      .orderBy(desc("jaccard_ppm"), asc("d1"), asc("d2"))
  }

  val qSimjoinPrefixSql: String =
    """WITH dt AS (SELECT DISTINCT doc_id,
      |    unnest(string_split(text, ' ')) AS term
      |  FROM documents WHERE doc_id % 10 = 0),
      |rk AS (SELECT term,
      |    row_number() OVER (ORDER BY count(*), term) AS trank
      |  FROM dt GROUP BY term),
      |sz AS (SELECT doc_id, count(*) AS sz FROM dt GROUP BY doc_id),
      |pf AS (SELECT doc_id, term FROM (
      |    SELECT d.doc_id, d.term, s.sz,
      |      row_number() OVER (PARTITION BY d.doc_id ORDER BY r.trank)
      |        AS pos
      |    FROM dt d JOIN rk r ON d.term = r.term
      |    JOIN sz s ON d.doc_id = s.doc_id)
      |  WHERE pos <= sz - ((3 * sz + 4) // 5) + 1),
      |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
      |  FROM pf a JOIN pf b ON a.term = b.term AND a.doc_id < b.doc_id),
      |iv AS (SELECT c.d1, c.d2, count(*) AS inter
      |  FROM cand c JOIN dt x ON x.doc_id = c.d1
      |  JOIN dt y ON y.doc_id = c.d2 AND y.term = x.term
      |  GROUP BY c.d1, c.d2)
      |SELECT d1, d2, inter,
      |  CAST(inter * 1000000 // (s1.sz + s2.sz - inter) AS BIGINT)
      |    AS jaccard_ppm
      |FROM iv JOIN sz s1 ON d1 = s1.doc_id JOIN sz s2 ON d2 = s2.doc_id
      |WHERE inter * 5 >= (s1.sz + s2.sz - inter) * 3
      |ORDER BY jaccard_ppm DESC, d1, d2""".stripMargin
}

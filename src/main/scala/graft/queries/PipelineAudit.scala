package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorOps

/** Round-3 pipeline audit + sample-prep wave (SURVEY.md §2.10j):
  * context-window token chunking, distribution-drift PSI, time-window
  * event dedup, and an ANN recall audit that measures the LSH scale
  * path against the exact ranking it approximates.
  *
  * Determinism: counts/ids are exact integers; ratios ship as integer
  * ppm (`div`); the two float outputs (psi, cos rank keys) follow the
  * round(4) q_surprisal precedent.
  */
object PipelineAudit {

  // ─────────────── fixed-size token chunking with overlap ───────────────

  private val ChunkTok = 32
  private val Stride = 24

  /** Context-window prep: split every doc into 32-token chunks with a
    * 24-token stride (8-token overlap) — the standard pretraining
    * sample shape. Chunk text ships as md5 (compact + driver-hashable);
    * chunk count per doc is `1 + ceil((n - C) / S)` in exact integer
    * arithmetic on both engines. One narrow pass, no shuffle before the
    * presentation sort — at 100 TB this is a pure map stage.
    */
  def qTokChunk(spark: SparkSession, sfDir: String): DataFrame =
    Tables.t(spark, sfDir, "documents")
      .withColumn("arr", split(col("text"), " "))
      .withColumn("n", size(col("arr")))
      .withColumn("n_chunks", expr(
        s"CASE WHEN n <= $ChunkTok THEN 1L" +
          s" ELSE 1L + (n - $ChunkTok + ${Stride - 1}) div $Stride END"))
      .select(col("doc_id"), col("arr"), col("n"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("k"))
      .select(col("doc_id"),
        (col("k") + 1).as("chunk_id"),
        (col("k") * Stride + 1).as("start_tok"),
        least(lit(ChunkTok.toLong), col("n") - col("k") * Stride)
          .cast("long").as("n_tok"),
        md5(array_join(slice(col("arr"),
          (col("k") * Stride + 1).cast("int"),
          least(lit(ChunkTok.toLong), col("n") - col("k") * Stride)
            .cast("int")), " ")).as("chunk_md5"))
      .orderBy("doc_id", "chunk_id")

  val qTokChunkSql: String =
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS arr
      |  FROM documents),
      |c AS (SELECT doc_id, arr, len(arr) AS n,
      |    CASE WHEN len(arr) <= $ChunkTok THEN 1
      |         ELSE 1 + (len(arr) - $ChunkTok + ${Stride - 1}) // $Stride
      |    END AS n_chunks FROM d)
      |SELECT doc_id, CAST(k + 1 AS BIGINT) AS chunk_id,
      |  CAST(k * $Stride + 1 AS BIGINT) AS start_tok,
      |  CAST(least($ChunkTok, n - k * $Stride) AS BIGINT) AS n_tok,
      |  md5(array_to_string(list_slice(arr, k * $Stride + 1,
      |      k * $Stride + least($ChunkTok, n - k * $Stride)), ' '))
      |    AS chunk_md5
      |FROM c, unnest(generate_series(0, n_chunks - 1)) AS t(k)
      |ORDER BY doc_id, chunk_id""".stripMargin

  // ─────────────── population-stability-index drift audit ───────────────

  /** Distribution drift per source vs the src0 reference: PSI over 10
    * fixed-width doc-length buckets with +1 Laplace smoothing (so empty
    * buckets stay finite and both engines divide the same exact
    * integers). Scale: bucket counts are one partial-aggregable groupBy
    * on a bounded (source × 10) key space; everything after is
    * grid-sized. The pipeline use: alert when a crawl snapshot's length
    * profile shifts against the reference corpus.
    */
  def qDriftPsi(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.t(spark, sfDir, "documents")
      .select(col("source"),
        least(lit(9L), expr("n_chars div 60")).as("bucket"))
    val cnt = docs.groupBy("source", "bucket").agg(count(lit(1)).as("c"))
    val grid = docs.select("source").distinct()
      .crossJoin(spark.range(0, 10).select(col("id").as("bucket")))
    val full = grid.join(cnt, Seq("source", "bucket"), "left")
      .na.fill(0L, Seq("c"))
    val tot = full.groupBy("source").agg(sum("c").as("n"))
    val wt = full.join(tot, "source")
    val ex = wt.filter(col("source") === "src0")
      .select(col("bucket"), col("c").as("ce"), col("n").as("ne"))
    val pa = (col("c") + 1) / (col("n") + 10)
    val pe = (col("ce") + 1) / (col("ne") + 10)
    wt.join(broadcast(ex), "bucket")
      .groupBy("source")
      .agg(max("n").as("n_docs"),
        round(sum((pa - pe) * log(pa / pe)), 4).as("psi"))
      .orderBy("source")
  }

  val qDriftPsiSql: String =
    """WITH d AS (SELECT source, least(9, n_chars // 60) AS bucket
      |  FROM documents),
      |cnt AS (SELECT source, bucket, count(*) AS c FROM d GROUP BY 1, 2),
      |grid AS (SELECT s.source, t.b AS bucket
      |  FROM (SELECT DISTINCT source FROM documents) s,
      |       unnest(generate_series(0, 9)) AS t(b)),
      |f AS (SELECT grid.source, grid.bucket, coalesce(cnt.c, 0) AS c
      |  FROM grid LEFT JOIN cnt
      |    ON grid.source = cnt.source AND grid.bucket = cnt.bucket),
      |tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n
      |  FROM f GROUP BY 1),
      |wt AS (SELECT f.source, f.bucket, f.c, t.n
      |  FROM f JOIN tot t USING (source)),
      |ex AS (SELECT bucket, c AS ce, n AS ne FROM wt WHERE source = 'src0')
      |SELECT w.source, CAST(max(w.n) AS BIGINT) AS n_docs,
      |  round(sum(
      |    ((w.c + 1) / CAST(w.n + 10 AS DOUBLE)
      |      - (e.ce + 1) / CAST(e.ne + 10 AS DOUBLE))
      |    * ln(((w.c + 1) / CAST(w.n + 10 AS DOUBLE))
      |       / ((e.ce + 1) / CAST(e.ne + 10 AS DOUBLE)))), 4) AS psi
      |FROM wt w JOIN ex e USING (bucket)
      |GROUP BY w.source ORDER BY w.source""".stripMargin

  // ─────────────── time-window event dedup ───────────────

  /** Windowed dedup: events collapse to one representative per
    * (user, event_type, 5-min bucket) — the batch form of
    * s_stream_dedup's watermark dedup, reported as kept/dropped counts
    * per type. The bucket key is exact integer µs arithmetic
    * (`unix_micros div 300e6` ≡ DuckDB `epoch_us // 300e6`), no
    * timestamp rendering in the output. Both groupBys are
    * partial-aggregable; keys are (users × types × buckets)-bounded.
    */
  def qWindowDedup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_type"), col("user_id"),
        expr("unix_micros(ts) div 300000000").as("bucket"))
      .groupBy("event_type", "user_id", "bucket")
      .agg(count(lit(1)).as("c"))
      .groupBy("event_type")
      .agg(sum("c").as("n_events"), count(lit(1)).as("n_kept"),
        (sum("c") - count(lit(1))).as("n_dropped"))
      .orderBy("event_type")

  val qWindowDedupSql: String =
    """WITH e AS (SELECT event_type, user_id,
      |    epoch_us(CAST(ts AS TIMESTAMP)) // 300000000 AS bucket
      |  FROM events),
      |k AS (SELECT event_type, user_id, bucket, count(*) AS c
      |  FROM e GROUP BY 1, 2, 3)
      |SELECT event_type, CAST(sum(c) AS BIGINT) AS n_events,
      |  count(*) AS n_kept,
      |  CAST(sum(c) - count(*) AS BIGINT) AS n_dropped
      |FROM k GROUP BY event_type ORDER BY event_type""".stripMargin

  // ─────────────── ANN recall audit (LSH vs exact) ───────────────

  /** Recall@10 of the q_sim_lsh sign-bucket ANN against the exact
    * cosine top-10, per query (vec_id < 5 queries vs vec_id ≥ 5
    * corpus). This is the audit every approximate index needs before it
    * replaces the exact scan at 100 TB: the candidate set is only the
    * query's own bucket, so n_approx < 10 and misses are EXPECTED —
    * the operator measures them. Rank keys are round(4)-grid-aligned
    * with vec_id tiebreaks (q_keywords precedent), so both engines rank
    * identically. The exact side's corpus-wide window is the audit-time
    * baseline by definition; the production ranking path is the
    * two-phase q_knn_join shape.
    */
  def qAnnRecall(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.t(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("bucket", PipelineExtra.lshBucket(col("v")))
      .withColumn("nrm", VectorOps.l2norm(col("v")))
    val q = e.filter(col("vec_id") < 5).select(
      col("vec_id").as("qid"), col("v").as("qv"),
      col("nrm").as("qn"), col("bucket").as("qb"))
    val c = e.filter(col("vec_id") >= 5).select(
      col("vec_id").as("cid"), col("v").as("cv"),
      col("nrm").as("cn"), col("bucket").as("cb"))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("cos", round(
        VectorOps.dot(col("cv"), col("qv")) / (col("cn") * col("qn")), 4))
      .select("qid", "cid", "cos", "cb", "qb")
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("cid"))
    val exact = scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10).select("qid", "cid")
    val approx = scored.filter(col("cb") === col("qb"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10).select("qid", "cid")
    val na = approx.groupBy("qid").agg(count(lit(1)).as("na"))
    val nh = exact.join(approx, Seq("qid", "cid"))
      .groupBy("qid").agg(count(lit(1)).as("nh"))
    q.select(col("qid"))
      .join(na, Seq("qid"), "left").join(nh, Seq("qid"), "left")
      .na.fill(0L, Seq("na", "nh"))
      .select(col("qid").as("query_id"), col("na").as("n_approx"),
        col("nh").as("n_hit"), (col("nh") * 100000).as("recall_ppm"))
      .orderBy("query_id")
  }

  val qAnnRecallSql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
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
      |q AS (SELECT e.vec_id AS qid, e.v AS qv, s.bucket AS qb
      |  FROM e JOIN sig s USING (vec_id) WHERE e.vec_id < 5),
      |c AS (SELECT e.vec_id AS cid, e.v AS cv, s.bucket AS cb
      |  FROM e JOIN sig s USING (vec_id) WHERE e.vec_id >= 5),
      |scored AS (SELECT qid, cid, cb, qb,
      |    round(CAST(list_cosine_similarity(cv, qv) AS DOUBLE), 4) AS cos
      |  FROM c, q),
      |exact AS (SELECT qid, cid FROM (
      |    SELECT qid, cid, row_number() OVER (
      |        PARTITION BY qid ORDER BY cos DESC, cid) AS rn
      |    FROM scored) WHERE rn <= 10),
      |approx AS (SELECT qid, cid FROM (
      |    SELECT qid, cid, row_number() OVER (
      |        PARTITION BY qid ORDER BY cos DESC, cid) AS rn
      |    FROM scored WHERE cb = qb) WHERE rn <= 10)
      |SELECT q.qid AS query_id,
      |  CAST(coalesce(a.na, 0) AS BIGINT) AS n_approx,
      |  CAST(coalesce(h.nh, 0) AS BIGINT) AS n_hit,
      |  CAST(coalesce(h.nh, 0) * 100000 AS BIGINT) AS recall_ppm
      |FROM q
      |LEFT JOIN (SELECT qid, count(*) AS na FROM approx GROUP BY qid) a
      |  ON q.qid = a.qid
      |LEFT JOIN (SELECT e2.qid, count(*) AS nh FROM exact e2 JOIN approx ap
      |    ON e2.qid = ap.qid AND e2.cid = ap.cid GROUP BY e2.qid) h
      |  ON q.qid = h.qid
      |ORDER BY query_id""".stripMargin

  // ─────────────── multi-probe LSH (the recall fix) ───────────────

  /** Multi-probe LSH top-10: each query probes its own bucket PLUS the 8
    * single-bit-flip neighbor buckets — the standard fix for the recall
    * loss q_ann_recall measures (more probes ≫ more tables, same index).
    * The probe set is a 9× in-row expansion of the O(|q|) broadcast query
    * side; candidates still come only from bucket equi-joins, so the
    * candidate count stays O(Σ probed-bucket sizes), never O(n²). Rank
    * keys round(4)-grid-aligned + cid tiebreak. The top-10 is two-phase
    * (round 11, the q_knn_join discipline): phase 1 ranks within
    * (qid, cid%32) slices — no window partition ever scales with the
    * corpus (a probed bucket holds O(9·n/256) rows at 100×) — phase 2
    * ranks the ≤ 320 slice survivors per query. row_number over the
    * total order (cos desc, cid asc) makes the two-phase result EXACTLY
    * the single-window ranking, which is what the single-window oracle
    * checks.
    */
  def qMultiProbeLsh(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.t(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("bucket", PipelineExtra.lshBucket(col("v")))
      .withColumn("nrm", VectorOps.l2norm(col("v")))
    val q = e.filter(col("vec_id") < 5).select(
      col("vec_id").as("qid"), col("v").as("qv"),
      col("nrm").as("qn"), col("bucket").as("qb"))
    val c = e.filter(col("vec_id") >= 5).select(
      col("vec_id").as("cid"), col("v").as("cv"),
      col("nrm").as("cn"), col("bucket").as("cb"))
    val probeCols: Seq[Column] = col("qb") +: (1 to 8).map { i =>
      concat(substring(col("qb"), 1, i - 1),
        when(substring(col("qb"), i, 1) === "1", lit("0")).otherwise(lit("1")),
        substring(col("qb"), i + 1, 8 - i))
    }
    val probes = q.select(col("qid"), col("qv"), col("qn"),
      explode(array(probeCols: _*)).as("probe"))
    val local = Window.partitionBy(col("qid"), col("cid") % 32)
      .orderBy(desc("cos"), asc("cid"))
    val global = Window.partitionBy("qid").orderBy(desc("cos"), asc("cid"))
    c.join(broadcast(probes), col("cb") === col("probe"))
      .withColumn("cos", round(
        VectorOps.dot(col("cv"), col("qv")) / (col("cn") * col("qn")), 4))
      .withColumn("lrk", row_number().over(local))
      .filter(col("lrk") <= 10)
      .withColumn("rn", row_number().over(global))
      .filter(col("rn") <= 10)
      .select(col("qid").as("query_id"), col("cid"), col("cos"))
      .orderBy(asc("query_id"), desc("cos"), asc("cid"))
  }

  val qMultiProbeLshSql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
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
      |q AS (SELECT e.vec_id AS qid, e.v AS qv, s.bucket AS qb
      |  FROM e JOIN sig s USING (vec_id) WHERE e.vec_id < 5),
      |probes AS (
      |  SELECT qid, qb AS probe FROM q
      |  UNION ALL
      |  SELECT qid, substr(qb, 1, i - 1)
      |    || (CASE WHEN substr(qb, i, 1) = '1' THEN '0' ELSE '1' END)
      |    || substr(qb, i + 1, 8 - i) AS probe
      |  FROM q, unnest(generate_series(1, 8)) t(i)),
      |c AS (SELECT e.vec_id AS cid, e.v AS cv, s.bucket AS cb
      |  FROM e JOIN sig s USING (vec_id) WHERE e.vec_id >= 5),
      |cand AS (SELECT p.qid, c.cid,
      |    round(CAST(list_cosine_similarity(c.cv, q.qv) AS DOUBLE), 4) AS cos
      |  FROM probes p JOIN c ON c.cb = p.probe JOIN q ON q.qid = p.qid)
      |SELECT qid AS query_id, cid, cos FROM (
      |  SELECT qid, cid, cos,
      |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rn
      |  FROM cand) WHERE rn <= 10
      |ORDER BY query_id, cos DESC, cid""".stripMargin

  // ──────── inter-rater agreement: Cohen's kappa (round 6, late) ────────

  /** Cohen's kappa between two rule-based quality raters — the agreement
    * audit a pipeline runs before swapping one curation filter for a
    * cheaper one (chance-corrected: 95% raw agreement means nothing if
    * both raters pass 95% of docs). Rater A: n_chars ≥ 300 (the stored
    * length metadata); rater B: whitespace token count ≥ 55 (recomputed
    * from text — the two thresholds sit on the same underlying scale, so
    * the off-diagonal is small but non-empty at every SF, which is
    * exactly the regime kappa exists for). Exact arithmetic end to end:
    * the 2×2 confusion matrix is integer sums, and kappa uses the
    * rational identity κ = 2(n11·n00 − n10·n01) /
    * ((n11+n10)(n10+n00) + (n11+n01)(n01+n00)) — algebraically equal to
    * (p_o−p_e)/(1−p_e) but with ONE double division at the end (the
    * q_eval_map integer-numerator precedent). Scale: one narrow pass,
    * one partial-aggregable global sum — a pure map stage at 100 TB.
    */
  def qEvalKappa(spark: SparkSession, sfDir: String): DataFrame =
    Tables.t(spark, sfDir, "documents")
      .select((col("n_chars") >= 300).cast("long").as("a"),
        (size(split(col("text"), " ")) >= 55).cast("long").as("b"))
      .agg(sum(col("a") * col("b")).as("n11"),
        sum(col("a") * (lit(1L) - col("b"))).as("n10"),
        sum((lit(1L) - col("a")) * col("b")).as("n01"),
        sum((lit(1L) - col("a")) * (lit(1L) - col("b"))).as("n00"))
      .select(col("n11"), col("n10"), col("n01"), col("n00"),
        round((col("n11") + col("n00")) /
          (col("n11") + col("n10") + col("n01") + col("n00"))
            .cast("double"), 4).as("po"),
        round(lit(2.0) *
          (col("n11") * col("n00") - col("n10") * col("n01")) /
          ((col("n11") + col("n10")) * (col("n10") + col("n00")) +
           (col("n11") + col("n01")) * (col("n01") + col("n00")))
            .cast("double"), 4).as("kappa"))

  val qEvalKappaSql: String =
    """WITH f AS (SELECT
      |    CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS a,
      |    CASE WHEN len(string_split(text, ' ')) >= 55 THEN 1 ELSE 0 END
      |      AS b
      |  FROM documents),
      |c AS (SELECT CAST(sum(a * b) AS BIGINT) AS n11,
      |    CAST(sum(a * (1 - b)) AS BIGINT) AS n10,
      |    CAST(sum((1 - a) * b) AS BIGINT) AS n01,
      |    CAST(sum((1 - a) * (1 - b)) AS BIGINT) AS n00
      |  FROM f)
      |SELECT n11, n10, n01, n00,
      |  round((n11 + n00) / CAST(n11 + n10 + n01 + n00 AS DOUBLE), 4)
      |    AS po,
      |  round(2.0 * (n11 * n00 - n10 * n01) /
      |    CAST((n11 + n10) * (n10 + n00) + (n11 + n01) * (n01 + n00)
      |      AS DOUBLE), 4) AS kappa
      |FROM c ORDER BY kappa""".stripMargin

  // ───────── MinHash estimator-quality audit (round 6, late) ─────────

  /** MinHash estimate vs EXACT token-set Jaccard over the LSH candidate
    * stream, rolled up by estimate level — the sketch-accuracy audit
    * that decides whether K=8 signatures can gate a 100 TB dedup pass
    * (the [[qAnnRecall]] discipline applied to the dedup funnel: measure
    * the approximation against the exact metric it replaces BEFORE
    * trusting it). Estimates are multiples of 1/K (binary-exact); exact
    * Jaccard travels as integer ppm (inter·10⁶ div union — the
    * q_ngram_novelty convention), so the per-level avg error is a sum of
    * exact ints with ONE final division onto round(4). Scale: candidates
    * come from the shared memoized pair stream (O(Σ bucket²), never
    * all-pairs); each doc's term set is gathered once and the pair join
    * is on doc id alone (the q_dedup_near map-gather shape); the rollup
    * key space is ≤ K+1 levels.
    */
  def qMinhashErr(spark: SparkSession, sfDir: String): DataFrame = {
    val sets = PipelinePlus.sampleTerms(spark, sfDir)
      .groupBy("doc_id").agg(collect_set("term").as("ts"))
    PipelinePlus.minhashPairs(spark, sfDir)
      .join(sets.select(col("doc_id").as("d1"), col("ts").as("t1")), "d1")
      .join(sets.select(col("doc_id").as("d2"), col("ts").as("t2")), "d2")
      .select(col("est_jaccard"),
        size(array_intersect(col("t1"), col("t2"))).cast("long").as("inter"),
        (size(col("t1")) + size(col("t2"))).cast("long").as("szs"))
      .select(col("est_jaccard"),
        expr("inter * 1000000 div (szs - inter)").as("jac_ppm"),
        (round(col("est_jaccard") * 1000000).cast("long")).as("est_ppm"))
      .groupBy(round(col("est_jaccard"), 4).as("est_jaccard"))
      .agg(count(lit(1)).as("n_pairs"),
        round(avg("jac_ppm"), 4).as("avg_exact_ppm"),
        round(avg(abs(col("est_ppm") - col("jac_ppm"))), 4)
          .as("avg_abserr_ppm"),
        max(abs(col("est_ppm") - col("jac_ppm"))).as("max_abserr_ppm"))
      .orderBy("est_jaccard")
  }

  val qMinhashErrSql: String =
    s"""WITH ${PipelinePlus.lshCandCte},
      |est AS (SELECT d1, d2, avg(CASE WHEN s1.mh = s2.mh
      |      THEN 1.0 ELSE 0.0 END) AS est_jaccard
      |  FROM cand JOIN sig s1 ON s1.doc_id = d1
      |    JOIN sig s2 ON s2.doc_id = d2 AND s2.k = s1.k
      |  GROUP BY d1, d2),
      |sz AS (SELECT doc_id, count(*) AS sz FROM dt GROUP BY doc_id),
      |iv AS (SELECT c.d1, c.d2, count(*) AS inter
      |  FROM cand c JOIN dt a ON a.doc_id = c.d1
      |    JOIN dt b ON b.doc_id = c.d2 AND b.term = a.term
      |  GROUP BY c.d1, c.d2),
      |p AS (SELECT e.est_jaccard,
      |    iv.inter * 1000000 // (s1.sz + s2.sz - iv.inter) AS jac_ppm,
      |    CAST(round(e.est_jaccard * 1000000) AS BIGINT) AS est_ppm
      |  FROM est e JOIN iv ON iv.d1 = e.d1 AND iv.d2 = e.d2
      |    JOIN sz s1 ON s1.doc_id = e.d1 JOIN sz s2 ON s2.doc_id = e.d2)
      |SELECT round(est_jaccard, 4) AS est_jaccard, count(*) AS n_pairs,
      |  round(avg(jac_ppm), 4) AS avg_exact_ppm,
      |  round(avg(abs(est_ppm - jac_ppm)), 4) AS avg_abserr_ppm,
      |  CAST(max(abs(est_ppm - jac_ppm)) AS BIGINT) AS max_abserr_ppm
      |FROM p GROUP BY 1 ORDER BY est_jaccard""".stripMargin

  // ───────── chi-square independence: lang × source ─────────

  /** Chi-square test of independence between `lang` and `source` (with
    * Cramér's V effect size) — the audit that decides whether language
    * can be stratified independently of source in a
    * [[PipelineCurate]]-style mixing pass, and the third leg of the
    * drift kit next to [[qDriftPsi]] (binned divergence) and
    * [[qStatsKs]] (continuous ECDF). Per cell, the term is
    * (O·N − r·c)²/(N·r·c): every factor an exact BIGINT product, one
    * double division per cell, summed over the |langs|×|sources|
    * BOUNDED grid (≤100 doubles) onto round(4). Scale: one
    * partial-aggregable (lang, source) count pass; the margins are
    * windows over the bounded grid, never the corpus.
    */
  def qStatsChi2(spark: SparkSession, sfDir: String): DataFrame = {
    val cell = Tables.t(spark, sfDir, "documents")
      .groupBy("lang", "source").agg(count(lit(1)).as("o"))
    val g = cell
      .withColumn("r", sum("o").over(Window.partitionBy("lang")))
      .withColumn("c", sum("o").over(Window.partitionBy("source")))
      .withColumn("nn", sum("o").over(Window.partitionBy()))
    g.agg(max("nn").as("n"),
        countDistinct("lang").as("nl"),
        countDistinct("source").as("ns"),
        round(sum(
          pow(col("o") * col("nn") - col("r") * col("c"), 2) /
            (col("nn") * col("r") * col("c")).cast("double")), 4)
          .as("chi2"))
      .select(col("n"),
        ((col("nl") - 1) * (col("ns") - 1)).as("dof"),
        col("chi2"),
        round(sqrt(col("chi2") /
          (col("n") * least(col("nl") - 1, col("ns") - 1)).cast("double")),
          4).as("cramers_v"))
  }

  val qStatsChi2Sql: String =
    """WITH cell AS (SELECT lang, source, count(*) AS o
      |  FROM documents GROUP BY lang, source),
      |g AS (SELECT o,
      |    sum(o) OVER (PARTITION BY lang) AS r,
      |    sum(o) OVER (PARTITION BY source) AS c,
      |    sum(o) OVER () AS nn, lang, source
      |  FROM cell),
      |a AS (SELECT CAST(max(nn) AS BIGINT) AS n,
      |    count(DISTINCT lang) AS nl, count(DISTINCT source) AS ns,
      |    round(sum(pow(o * nn - r * c, 2) /
      |      CAST(nn * r * c AS DOUBLE)), 4) AS chi2
      |  FROM g)
      |SELECT n, (nl - 1) * (ns - 1) AS dof, chi2,
      |  round(sqrt(chi2 / CAST(n * least(nl - 1, ns - 1) AS DOUBLE)), 4)
      |    AS cramers_v
      |FROM a ORDER BY chi2""".stripMargin

  // ───────── mutual information: lang × source ─────────

  /** Mutual information (and the sqrt-normalized NMI) between `lang`
    * and `source` — the information-theoretic companion to
    * [[qStatsChi2]] on the same bounded grid: how many nats knowing
    * the source tells you about the language (the signal a
    * stratified-mixing pass exploits; NMI≈0 ⇒ the axes can be sampled
    * independently). Every ln argument is a ratio of exact BIGINTs
    * (o·N/(r·c) — the [[PipelineCurate]] KL ln-of-rationals
    * discipline), entropies likewise from exact marginal counts; sums
    * run over the ≤100-cell grid onto round(4). Scale: one
    * partial-aggregable (lang, source) pass; margins are windows over
    * the bounded grid.
    */
  def qStatsMi(spark: SparkSession, sfDir: String): DataFrame = {
    val cell = Tables.t(spark, sfDir, "documents")
      .groupBy("lang", "source").agg(count(lit(1)).as("o"))
    val g = cell
      .withColumn("r", sum("o").over(Window.partitionBy("lang")))
      .withColumn("c", sum("o").over(Window.partitionBy("source")))
      .withColumn("nn", sum("o").over(Window.partitionBy()))
    val hl = sum((col("o") / col("nn").cast("double")) *
      log(col("nn").cast("double") / col("r"))) // grid-summed H(lang)
    g.agg(max("nn").as("n"),
        round(sum((col("o") / col("nn").cast("double")) *
          log((col("o") * col("nn")).cast("double") /
            (col("r") * col("c")))), 4).as("mi_nats"),
        round(sum((col("o") / col("nn").cast("double")) *
          log(col("nn").cast("double") / col("r"))), 4).as("h_lang"),
        round(sum((col("o") / col("nn").cast("double")) *
          log(col("nn").cast("double") / col("c"))), 4).as("h_source"),
        round(sum((col("o") / col("nn").cast("double")) *
          log((col("o") * col("nn")).cast("double") /
            (col("r") * col("c")))) /
          sqrt(hl * sum((col("o") / col("nn").cast("double")) *
            log(col("nn").cast("double") / col("c")))), 4).as("nmi"))
  }

  val qStatsMiSql: String =
    """WITH cell AS (SELECT lang, source, count(*) AS o
      |  FROM documents GROUP BY lang, source),
      |g AS (SELECT o,
      |    sum(o) OVER (PARTITION BY lang) AS r,
      |    sum(o) OVER (PARTITION BY source) AS c,
      |    sum(o) OVER () AS nn
      |  FROM cell)
      |SELECT CAST(max(nn) AS BIGINT) AS n,
      |  round(sum((o / CAST(nn AS DOUBLE)) *
      |    ln(CAST(o * nn AS DOUBLE) / (r * c))), 4) AS mi_nats,
      |  round(sum((o / CAST(nn AS DOUBLE)) *
      |    ln(CAST(nn AS DOUBLE) / r)), 4) AS h_lang,
      |  round(sum((o / CAST(nn AS DOUBLE)) *
      |    ln(CAST(nn AS DOUBLE) / c)), 4) AS h_source,
      |  round(sum((o / CAST(nn AS DOUBLE)) *
      |    ln(CAST(o * nn AS DOUBLE) / (r * c))) /
      |    sqrt(sum((o / CAST(nn AS DOUBLE)) * ln(CAST(nn AS DOUBLE) / r)) *
      |      sum((o / CAST(nn AS DOUBLE)) * ln(CAST(nn AS DOUBLE) / c))),
      |    4) AS nmi
      |FROM g ORDER BY mi_nats""".stripMargin

  // ───────── two-sample Kolmogorov-Smirnov drift test ─────────

  /** Exact two-sample KS statistic between the `value` distributions of
    * click vs purchase events — the distribution-drift test next to
    * [[qDriftPsi]]'s binned PSI: KS needs no binning choice and reports
    * WHERE the distributions diverge most. Values land on the round(2)
    * grid first (a bounded domain — the q_eval_auc distinct-rounded-
    * scores discipline: the ECDF window runs over grid points, never a
    * corpus-sized single-partition sort), then D = max |F₁ − F₂| is
    * computed in EXACT integer cross-multiplied form: per grid point,
    * |i·m − j·n| with i, j the cumulative counts and n, m the sample
    * sizes — the max is over exact BIGINTs, the argmax value ships with
    * the min-value tiebreak, and ONE final division lands D on
    * round(6). Scale: one narrow pass, one bounded-key aggregate, one
    * bounded-domain window.
    */
  def qStatsKs(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.t(spark, sfDir, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select(round(col("value"), 2).as("v"),
        when(col("event_type") === "click", 1L).otherwise(0L).as("a"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("b"))
    val grid = ev.groupBy("v")
      .agg(sum("a").as("c1"), sum("b").as("c2"))
    val ord = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val all = Window.partitionBy()
    val gaps = grid
      .withColumn("i", sum("c1").over(ord))
      .withColumn("j", sum("c2").over(ord))
      .withColumn("n", sum("c1").over(all))
      .withColumn("m", sum("c2").over(all))
      // i·m and j·n are N²-order: two BIGINT cumulative counts multiplied
      // wrap past ~3e9 events in non-ANSI Spark, so widen to
      // DECIMAL(38,0) (the TpchCanon revE4 convention) before the product
      .withColumn("gap", abs(col("i").cast("decimal(19,0)") * col("m") -
        col("j").cast("decimal(19,0)") * col("n")))
    gaps
      .orderBy(desc("gap"), asc("v"))
      .limit(1)
      .select(col("n").as("n_click"), col("m").as("n_purchase"),
        col("v").as("ks_at"),
        round(col("gap").cast("double") /
          (col("n").cast("decimal(19,0)") * col("m")).cast("double"), 6)
          .as("ks"))
  }

  val qStatsKsSql: String =
    """WITH ev AS (SELECT round(value, 2) AS v,
      |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS a,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS b
      |  FROM events WHERE event_type IN ('click', 'purchase')),
      |grid AS (SELECT v, sum(a) AS c1, sum(b) AS c2 FROM ev GROUP BY v),
      |g AS (SELECT v,
      |    sum(c1) OVER (ORDER BY v) AS i, sum(c2) OVER (ORDER BY v) AS j,
      |    sum(c1) OVER () AS n, sum(c2) OVER () AS m
      |  FROM grid)
      |SELECT CAST(n AS BIGINT) AS n_click, CAST(m AS BIGINT) AS n_purchase,
      |  v AS ks_at, round(abs(i * m - j * n) / CAST(n * m AS DOUBLE), 6)
      |    AS ks
      |FROM g ORDER BY abs(i * m - j * n) DESC, v LIMIT 1""".stripMargin

  // ───────── Mann-Whitney U rank-sum drift test ─────────

  /** Mann-Whitney U (Wilcoxon rank-sum) between the click and purchase
    * `value` distributions — the nonparametric location test completing
    * the drift kit: [[qDriftPsi]] (binned), [[qStatsKs]] (max ECDF gap),
    * chi-square (categorical), and now a rank test that detects a
    * SHIFT the symmetric KS gap can understate. Entirely
    * histogram-driven (the [[qStatsKs]] round(2) grid discipline — the
    * rank window runs over grid points, never a corpus sort): with h(v)
    * the per-value counts, sample-1's doubled tie-averaged rank sum is
    * Σ c1·(2·cum_before + c + 1) — exact BIGINTs — so 2·U1 = 2·R1 −
    * n(n+1) is exact; the normal approximation applies the standard
    * tie correction σ² = nm/12·((N+1) − Σ(c³−c)/(N(N−1))) with ONE
    * sqrt and one division at the end. The common-language effect size
    * U1/(nm) (= AUC of "click ranks above purchase") ships alongside
    * round(4). Scale: one narrow pass + one bounded-grid window.
    */
  def qStatsMannWhitney(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.t(spark, sfDir, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select(round(col("value"), 2).as("v"),
        when(col("event_type") === "click", 1L).otherwise(0L).as("a"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("b"))
    val grid = ev.groupBy("v")
      .agg(sum("a").as("c1"), sum("b").as("c2"))
      .withColumn("c", col("c1") + col("c2"))
    val before = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    grid
      .withColumn("cum", coalesce(sum("c").over(before), lit(0L)))
      // r1x2 is N²-order and ties is N³-order: widen the exact-int
      // accumulations to DECIMAL(38,0) (revE4 convention) so the
      // exactness claim holds past ~3e9 events; the final z/auc math is
      // double anyway, entered via exact decimal→double conversions
      .agg(sum("c1").as("n"), sum("c2").as("m"),
        sum(col("c1").cast("decimal(19,0)") *
          (lit(2L) * col("cum") + col("c") + 1L)).as("r1x2"),
        sum(col("c").cast("decimal(12,0)") * col("c") * col("c") -
          col("c")).as("ties"))
      .withColumn("nn1", col("n").cast("decimal(19,0)") * (col("n") + 1L))
      .withColumn("nm", col("n").cast("decimal(19,0)") * col("m"))
      .select(col("n").as("n_click"), col("m").as("n_purchase"),
        round((col("r1x2") - col("nn1")).cast("double") / lit(2.0), 1)
          .as("u1"),
        round((col("r1x2") - col("nn1") - col("nm")).cast("double") /
          (lit(2.0) * sqrt(col("nm").cast("double") / lit(12.0) *
            ((col("n") + col("m") + 1L).cast("double") -
              col("ties").cast("double") /
              ((col("n") + col("m")).cast("decimal(19,0)") *
                (col("n") + col("m") - 1L)).cast("double")))), 4)
          .as("z"),
        round((col("r1x2") - col("nn1")).cast("double") /
          (lit(2.0) * col("nm").cast("double")), 4).as("auc"))
  }

  val qStatsMannWhitneySql: String =
    """WITH ev AS (SELECT round(value, 2) AS v,
      |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS a,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS b
      |  FROM events WHERE event_type IN ('click', 'purchase')),
      |grid AS (SELECT v, sum(a) AS c1, sum(b) AS c2, sum(a) + sum(b) AS c
      |  FROM ev GROUP BY v),
      |w AS (SELECT c1, c2, c, coalesce(sum(c) OVER (ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
      |  FROM grid),
      |a AS (SELECT CAST(sum(c1) AS BIGINT) AS n,
      |    CAST(sum(c2) AS BIGINT) AS m,
      |    CAST(sum(c1 * (2 * cum + c + 1)) AS BIGINT) AS r1x2,
      |    CAST(sum(c * c * c - c) AS BIGINT) AS ties
      |  FROM w)
      |SELECT n AS n_click, m AS n_purchase,
      |  round((r1x2 - n * (n + 1)) / 2.0, 1) AS u1,
      |  round((r1x2 - n * (n + 1) - n * m) /
      |    (2.0 * sqrt(n * m / 12.0 * ((n + m + 1) - ties /
      |      CAST((n + m) * (n + m - 1) AS DOUBLE)))), 4) AS z,
      |  round((r1x2 - n * (n + 1)) / (2.0 * n * m), 4) AS auc
      |FROM a ORDER BY z""".stripMargin

  // ───────── Benford first-digit anomaly audit ─────────

  /** Benford's-law first-digit audit of `o_totalprice` — the classic
    * fabricated-/corrupted-feed detector for a financial fact column:
    * observed first-significant-digit shares vs the log10(1+1/d)
    * expectation, per digit, with the deviation in ppm. The digit is
    * extracted ARITHMETICALLY from the integer part via its decimal
    * string (integer-to-string is engine-exact; a double-to-string
    * cast is not — Spark renders large doubles in scientific
    * notation), shares ship as integer ppm (`div` — the round(4)
    * .00005-tie gotcha doesn't exist on integers), and the expected
    * ppm uses floor() so no round-half mode is involved. Scale: one
    * narrow map pass + a 9-key aggregate; the total is a window over
    * the 9-row grid.
    */
  def qStatsBenford(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.t(spark, sfDir, "orders")
      .select(substring(floor(col("o_totalprice")).cast("long")
        .cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    d.withColumn("total", sum("n").over(Window.partitionBy()))
      .select(col("digit"), col("n"),
        expr("n * 1000000 div total").as("obs_ppm"),
        floor(log10(lit(1.0) + lit(1.0) / col("digit")) * 1e6)
          .cast("long").as("exp_ppm"))
      .withColumn("dev_ppm", col("obs_ppm") - col("exp_ppm"))
      .orderBy("digit")
  }

  val qStatsBenfordSql: String =
    """WITH d AS (SELECT CAST(substring(CAST(CAST(floor(o_totalprice)
      |      AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit
      |  FROM orders),
      |g AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
      |w AS (SELECT digit, n, sum(n) OVER () AS total FROM g)
      |SELECT digit, CAST(n AS BIGINT) AS n,
      |  CAST(n * 1000000 // total AS BIGINT) AS obs_ppm,
      |  CAST(floor(log10(1.0 + 1.0 / digit) * 1e6) AS BIGINT) AS exp_ppm,
      |  CAST(n * 1000000 // total - floor(log10(1.0 + 1.0 / digit) * 1e6)
      |    AS BIGINT) AS dev_ppm
      |FROM w ORDER BY digit""".stripMargin

  // ───────── Welch two-sample t-test (round 7, wave 4) ─────────

  /** Welch's unequal-variance two-sample t-test between the click and
    * purchase `value` distributions — the parametric location test
    * completing the drift kit's trio: [[qStatsMannWhitney]] (rank),
    * [[qStatsKs]] (ECDF), and now the mean test with the
    * Welch–Satterthwaite df. All inputs are single-pass mergeable
    * conditional co-moment aggregates (avg / var_samp over a CASE —
    * the q_corr_stats precedent for cross-engine stable moments at
    * round(4)); t and df are one fixed-association double expression
    * each.
    */
  def qStatsWelch(spark: SparkSession, sfDir: String): DataFrame =
    Tables.t(spark, sfDir, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("n1"),
        avg(when(col("event_type") === "click", col("value"))).as("m1"),
        expr("var_samp(CASE WHEN event_type = 'click' THEN value END)")
          .as("v1"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n2"),
        avg(when(col("event_type") === "purchase", col("value"))).as("m2"),
        expr("var_samp(CASE WHEN event_type = 'purchase' THEN value END)")
          .as("v2"))
      .select(col("n1").as("n_click"), col("n2").as("n_purchase"),
        round(col("m1") - col("m2"), 4).as("mean_diff"),
        expr("round((m1 - m2) / sqrt(v1/n1 + v2/n2), 4)").as("t_stat"),
        expr("round(pow(v1/n1 + v2/n2, 2) / (pow(v1/n1, 2) / (n1 - 1)" +
          " + pow(v2/n2, 2) / (n2 - 1)), 4)").as("df"))
      .orderBy("n_click")

  val qStatsWelchSql: String =
    """WITH a AS (SELECT
      |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS n1,
      |    avg(CASE WHEN event_type = 'click' THEN value END) AS m1,
      |    var_samp(CASE WHEN event_type = 'click' THEN value END) AS v1,
      |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n2,
      |    avg(CASE WHEN event_type = 'purchase' THEN value END) AS m2,
      |    var_samp(CASE WHEN event_type = 'purchase' THEN value END) AS v2
      |  FROM events WHERE event_type IN ('click', 'purchase'))
      |SELECT CAST(n1 AS BIGINT) AS n_click,
      |  CAST(n2 AS BIGINT) AS n_purchase,
      |  round(m1 - m2, 4) AS mean_diff,
      |  round((m1 - m2) / sqrt(v1/n1 + v2/n2), 4) AS t_stat,
      |  round(pow(v1/n1 + v2/n2, 2) / (pow(v1/n1, 2) / (n1 - 1)
      |    + pow(v2/n2, 2) / (n2 - 1)), 4) AS df
      |FROM a ORDER BY n_click""".stripMargin

  // ───────────────── hash-bootstrap confidence interval ─────────────────

  /** Bootstrap-style confidence interval for the mean order value
    * WITHOUT RNG state: 30 deterministic replicates driven by ONE
    * content hash per order — replicate b keeps orders whose 60-bit
    * md5Bucket has a non-zero bit-pair at position 2b (an exact
    * Bernoulli(3/4) subsample per replicate, independent across b by
    * hash-bit independence; the q_split_train hash-gate convention with
    * one md5 per row instead of one per (row, replicate)). Each
    * replicate's mean is exact integer cents; the CI is the EXPLICIT
    * 2nd/29th rank pick of the 30 sorted means (the
    * q_evt_percentile_ts ceiling-index rule). Scale: one fact pass
    * fanned ×30 in-row (bounded constant, one hash amortized across
    * all replicates), partial-aggregable into 30 groups; the CI window
    * runs over exactly 30 rows.
    */
  def qStatsBootstrap(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.Tables
    val o = Tables.t(spark, sfDir, "orders")
      .select(col("o_orderkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .withColumn("h", Tables.md5Bucket(col("o_orderkey").cast("string")))
    val reps = o
      .select(col("h"), col("cents"),
        explode(sequence(lit(0), lit(29))).as("b"))
      .filter(expr("(shiftright(h, 2 * b) & 3) != 0"))
      .groupBy("b")
      .agg(expr("sum(cents) div count(*)").as("rep_mean"))
    val w = Window.orderBy("rep_mean", "b")
    val ranked = reps.withColumn("rn", row_number().over(w))
    val full = o.agg(count(lit(1)).as("n_orders"),
      expr("sum(cents) div count(*)").as("mean_cents"))
    full.crossJoin(broadcast(
        ranked.filter(col("rn") === 2)
          .select(col("rep_mean").as("boot_lo_cents"))))
      .crossJoin(broadcast(
        ranked.filter(col("rn") === 29)
          .select(col("rep_mean").as("boot_hi_cents"))))
      .select("n_orders", "mean_cents", "boot_lo_cents", "boot_hi_cents")
  }

  val qStatsBootstrapSql: String =
    """WITH o AS (SELECT
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
      |    ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))
      |      ::BIGINT AS h
      |  FROM orders),
      |reps AS (SELECT b, CAST(sum(cents) // count(*) AS BIGINT)
      |    AS rep_mean
      |  FROM o, unnest(generate_series(0, 29)) AS t(b)
      |  WHERE ((h >> (2 * b)) & 3) <> 0
      |  GROUP BY b),
      |r AS (SELECT rep_mean,
      |    row_number() OVER (ORDER BY rep_mean, b) AS rn FROM reps),
      |f AS (SELECT count(*) AS n_orders,
      |    CAST(sum(cents) // count(*) AS BIGINT) AS mean_cents FROM o)
      |SELECT f.n_orders, f.mean_cents,
      |  (SELECT rep_mean FROM r WHERE rn = 2) AS boot_lo_cents,
      |  (SELECT rep_mean FROM r WHERE rn = 29) AS boot_hi_cents
      |FROM f ORDER BY n_orders""".stripMargin

  // ───────────── hash-permutation test (purchase vs click) ─────────────

  /** Permutation test for the purchase-vs-click mean-value difference
    * WITHOUT RNG: 30 deterministic label permutations — permutation b
    * swaps an event's group iff bit b of its 60-bit md5 content hash is
    * set (expected half the labels flip, the standard approximate
    * permutation) — and the p-value is the exact rank of the observed
    * |difference| among the permuted ones ((#{|perm| ≥ |obs|} + 1) /
    * (B + 1), in ppm). Means are exact integer cents (div); ONE hash
    * per event amortizes across all 30 permutations (the
    * q_stats_bootstrap convention). One fact pass fanned ×30 in-row,
    * partial-aggregable into 30×2 groups.
    */
  def qStatsPermutation(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.Tables
    val ev = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("purchase", "click"))
      .select((col("event_type") === "purchase").cast("long").as("g"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"),
        Tables.md5Bucket(col("event_id").cast("string")).as("h"))
    val obs = ev.groupBy("g")
      .agg(expr("sum(cents) div count(*)").as("m"))
      .agg(expr("abs(max(CASE WHEN g = 1 THEN m END) - " +
        "max(CASE WHEN g = 0 THEN m END))").as("obs_diff"))
    val perm = ev
      .select(col("g"), col("cents"), col("h"),
        explode(sequence(lit(0), lit(29))).as("b"))
      .withColumn("gp", expr("(g + (shiftright(h, b) & 1)) % 2"))
      .groupBy("b", "gp")
      .agg(expr("sum(cents) div count(*)").as("m"))
      .groupBy("b")
      .agg(expr("abs(max(CASE WHEN gp = 1 THEN m END) - " +
        "max(CASE WHEN gp = 0 THEN m END))").as("pd"))
    perm.crossJoin(broadcast(obs))
      .agg(count(lit(1)).as("n_perms"),
        sum((col("pd") >= col("obs_diff")).cast("long")).as("n_ge"),
        max("obs_diff").as("obs_diff_cents"))
      .select(col("n_perms"), col("obs_diff_cents"), col("n_ge"),
        expr("((n_ge + 1) * 1000000) div (n_perms + 1)").as("p_ppm"))

  }

  val qStatsPermutationSql: String =
    """WITH ev AS (SELECT
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g,
      |    CAST(round(value * 100) AS BIGINT) AS cents,
      |    ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))
      |      ::BIGINT AS h
      |  FROM events WHERE event_type IN ('purchase', 'click')),
      |o AS (SELECT abs(max(CASE WHEN g = 1 THEN m END) -
      |    max(CASE WHEN g = 0 THEN m END)) AS obs_diff
      |  FROM (SELECT g, CAST(sum(cents) // count(*) AS BIGINT) AS m
      |    FROM ev GROUP BY g)),
      |pm AS (SELECT b, abs(max(CASE WHEN gp = 1 THEN m END) -
      |    max(CASE WHEN gp = 0 THEN m END)) AS pd
      |  FROM (SELECT b, (g + ((h >> b) & 1)) % 2 AS gp,
      |      CAST(sum(cents) // count(*) AS BIGINT) AS m
      |    FROM ev, unnest(generate_series(0, 29)) AS t(b)
      |    GROUP BY b, gp) GROUP BY b)
      |SELECT count(*) AS n_perms,
      |  CAST(max(o.obs_diff) AS BIGINT) AS obs_diff_cents,
      |  CAST(sum(CASE WHEN pd >= o.obs_diff THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_ge,
      |  CAST(((sum(CASE WHEN pd >= o.obs_diff THEN 1 ELSE 0 END) + 1)
      |    * 1000000) // (count(*) + 1) AS BIGINT) AS p_ppm
      |FROM pm, o ORDER BY n_perms""".stripMargin

  // ───────────── Hill tail-index estimator ─────────────

  /** Hill estimator of the order-value tail exponent over the top
    * k = 100 values: α̂ = 1 / mean(ln(x_i / x_(k+1))) — the
    * heavy-tail diagnostic next to q_zipf_fit's rank-frequency slope
    * and q_pareto_cut's 80/20 readout (α ≈ how fast the tail decays;
    * α < 2 means infinite variance, the regime where mean-based SLAs
    * lie). The top-(k+1) cut is a distributed TakeOrdered; each ln
    * ratio of exact integer cents is rounded to integer MICRONATS
    * before the 100-term mean (order-free).
    */
  def qHillTail(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.Tables
    val top = Tables.t(spark, sfDir, "orders")
      .select(col("o_orderkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .orderBy(desc("cents"), asc("o_orderkey"))
      .limit(101)
    val w = Window.orderBy(desc("cents"), asc("o_orderkey"))
    val ranked = top.withColumn("rn", row_number().over(w))
    val xk1 = ranked.filter(col("rn") === 101)
      .select(col("cents").as("xk1"))
    ranked.filter(col("rn") <= 100)
      .crossJoin(broadcast(xk1))
      .select(expr("""CAST(round(ln(CAST(cents AS DOUBLE) / xk1)
        | * CAST(1000000.0 AS DOUBLE)) AS BIGINT)""".stripMargin)
        .as("ln_e6"), col("xk1"))
      .agg(count(lit(1)).as("k"), max("xk1").as("xk1_cents"),
        expr("sum(ln_e6) div count(*)").as("mean_ln_e6"))
      .select(col("k"), col("xk1_cents"), col("mean_ln_e6"),
        expr("1000000000 div greatest(mean_ln_e6, 1)").as("alpha_e3"))
  }

  val qHillTailSql: String =
    """WITH top AS (SELECT o_orderkey,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders ORDER BY cents DESC, o_orderkey LIMIT 101),
      |r AS (SELECT cents, row_number() OVER
      |    (ORDER BY cents DESC, o_orderkey) AS rn FROM top),
      |k1 AS (SELECT cents AS xk1 FROM r WHERE rn = 101),
      |l AS (SELECT CAST(round(ln(CAST(cents AS DOUBLE) / xk1)
      |      * CAST(1000000.0 AS DOUBLE)) AS BIGINT) AS ln_e6, xk1
      |  FROM r, k1 WHERE rn <= 100)
      |SELECT count(*) AS k, CAST(max(xk1) AS BIGINT) AS xk1_cents,
      |  CAST(sum(ln_e6) // count(*) AS BIGINT) AS mean_ln_e6,
      |  CAST(1000000000 // greatest(sum(ln_e6) // count(*), 1) AS BIGINT)
      |    AS alpha_e3
      |FROM l ORDER BY k""".stripMargin

  // ───────── train/test leakage audit (round 11, §2.22) ─────────

  /** Near-dup LEAKAGE across the content-hash train/val/test split —
    * the audit every pipeline runs after splitting: a near-duplicate
    * pair straddling two splits leaks training signal into eval.
    * Pairs are the verified minhash near-dups of the §2.10 shared
    * sample (signature agreement ≥ 7/8, the q_dedup_cluster edge
    * threshold); splits are q_split_train's content-hash buckets
    * (train < 80 ≤ val < 90 ≤ test). One row per unordered split pair
    * (canonicalized by least/greatest) with the pair count and a
    * `leaky` flag — the off-diagonal rows are the contamination. Scale:
    * the pair stream is the capped banding pipeline (memoized); the
    * split label is one narrow hash projection joined twice by doc key.
    */
  def qSplitLeakage(spark: SparkSession, sfDir: String): DataFrame = {
    val folds = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"),
        when(Tables.md5Bucket(col("text")) % 100 < 80, "train")
          .when(Tables.md5Bucket(col("text")) % 100 < 90, "val")
          .otherwise("test").as("split"))
    val pairs = PipelinePlus.minhashPairs(spark, sfDir)
      .filter(col("est_jaccard") >= 0.875)
      .select("d1", "d2")
    pairs
      .join(folds.toDF("d1", "s1"), "d1")
      .join(folds.toDF("d2", "s2"), "d2")
      .select(least(col("s1"), col("s2")).as("split_a"),
        greatest(col("s1"), col("s2")).as("split_b"))
      .groupBy("split_a", "split_b")
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("leaky", col("split_a") =!= col("split_b"))
      .orderBy("split_a", "split_b")
  }

  val qSplitLeakageSql: String =
    s"""WITH ${PipelinePlus.lshCandCte},
      |hi AS (SELECT d1, d2
      |  FROM cand JOIN sig s1 ON s1.doc_id = d1
      |    JOIN sig s2 ON s2.doc_id = d2 AND s2.k = s1.k
      |  GROUP BY d1, d2
      |  HAVING avg(CASE WHEN s1.mh = s2.mh THEN 1.0 ELSE 0.0 END)
      |    >= 0.875),
      |folds AS (SELECT doc_id,
      |    CASE WHEN ('0x' || substr(md5(text), 1, 15))::BIGINT % 100 < 80
      |      THEN 'train'
      |      WHEN ('0x' || substr(md5(text), 1, 15))::BIGINT % 100 < 90
      |      THEN 'val' ELSE 'test' END AS split
      |  FROM documents)
      |SELECT least(f1.split, f2.split) AS split_a,
      |  greatest(f1.split, f2.split) AS split_b,
      |  count(*) AS n_pairs,
      |  least(f1.split, f2.split) <> greatest(f1.split, f2.split)
      |    AS leaky
      |FROM hi JOIN folds f1 ON f1.doc_id = hi.d1
      |  JOIN folds f2 ON f2.doc_id = hi.d2
      |GROUP BY split_a, split_b, leaky ORDER BY split_a, split_b""".stripMargin
}

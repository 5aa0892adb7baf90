package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table readers + shared helpers for all queries.
  *
  * Design notes (scale): every reader returns a plain parquet-backed
  * DataFrame so Catalyst keeps pushdown/pruning; the only materialization
  * is the tokenized `documents` projection, which ~9 search queries share
  * (SURVEY.md §4.3).
  */
object Tables {

  /** The generator emits parquet timestamps annotated
    * `isAdjustedToUTC=false`, which Spark 4 surfaces as TIMESTAMP_NTZ by
    * default. Everything downstream (range frames on `unix_micros`, ts
    * literals cast with `cast("timestamp")`, the DuckDB oracle's naive
    * TIMESTAMP under a UTC session) is written against TimestampType, so
    * pin the reader to the classic mapping. Session TZ is UTC in every
    * entrypoint, making the two readings value-identical.
    *
    * The pin happens ONCE per session (round-5 advice: a per-call
    * `conf.set` is both redundant churn and a hidden override of any
    * later deliberate conf change in the same session — with the
    * once-per-app guard, code that re-sets either conf after the first
    * table read keeps its setting). `nanosAsLong` is pinned here too so
    * [[events]] can read a TIMESTAMP(NANOS) file (Spark 4 otherwise
    * refuses the annotation outright, SURVEY.md §1.3).
    */
  private val confPinned =
    scala.collection.concurrent.TrieMap.empty[String, Boolean]

  private def pinParquetConfs(spark: SparkSession): Unit =
    confPinned.getOrElseUpdate(spark.sparkContext.applicationId, {
      spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      true
    })

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    pinParquetConfs(spark)
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** `events.ts` has shipped as both TIMESTAMP(NANOS,false) — which Spark
    * 4.x refuses to read natively (SURVEY.md §1.3) and the legacy conf
    * surfaces as a long of epoch-nanos — and plain TIMESTAMP(MICROS).
    * Normalize either encoding to a µs TimestampType column. The ns→µs
    * conversion uses INTEGER division: double division can round the last
    * microsecond. DuckDB reads the same column as a naive TIMESTAMP either
    * way; oracle SQL keeps CAST(ts AS TIMESTAMP) (a no-op on µs data).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = t(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  /** Atomic memoize-for-persist. `concurrent.Map.getOrElseUpdate` may
    * evaluate the by-name default MORE THAN ONCE under contention — only
    * one value wins the putIfAbsent, and a losing value that was already
    * `.persist()`ed leaks in storage memory with no handle to unpersist
    * it. Two concurrent first-callers are a real schedule here: ScalaTest
    * suites share the forked test JVM. Serializing the build closes the
    * race; the lock is uncontended after first materialization.
    */
  private[graft] def memo[T](
      cache: scala.collection.concurrent.TrieMap[String, T],
      key: String)(build: => T): T =
    cache.synchronized { cache.getOrElseUpdate(key, captureMemoPins(build)) }

  /** RDD ids pinned while building a MEMOIZED relation (the persist
    * itself plus any loop-internal localCheckpoint living inside the
    * memoized lineage, e.g. connectedComponents' rounds). These must
    * survive the per-query slot release in [[trackPins]]: a memoized
    * DataFrame outlives the invocation that built it, and unpersisting
    * a localCheckpoint RDD its lineage still references would break it
    * permanently (checkpoint blocks cannot be recomputed). */
  private val memoPins =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()

  private def captureMemoPins[T](build: => T): T =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession) match {
      case Some(s) =>
        val sc = s.sparkContext
        val before = sc.getPersistentRDDs.keySet
        val out = build
        sc.getPersistentRDDs.keySet.diff(before).foreach(id =>
          memoPins.add(id))
        out
      case None => build
    }

  // ─────────────── memo-cache lifecycle (round 11) ───────────────

  /** Every memoized-DataFrame cache in the engine registers here at
    * object-init, giving [[clearCaches]] a handle on all of them. The
    * memo maps key on (applicationId, sfDir) and persist() without
    * unpersist — correct in the driver's one-shot protocol (one SF per
    * JVM, caches die with it), but a long-lived session sweeping many
    * sfDirs accumulates pinned relations. */
  private val dfCaches = scala.collection.mutable.ArrayBuffer
    .empty[scala.collection.concurrent.TrieMap[String, org.apache.spark.sql.DataFrame]]

  private[graft] def registerCache()
      : scala.collection.concurrent.TrieMap[String, org.apache.spark.sql.DataFrame] = {
    val c = scala.collection.concurrent.TrieMap
      .empty[String, org.apache.spark.sql.DataFrame]
    dfCaches.synchronized { dfCaches += c }
    c
  }

  /** Memo maps for non-DataFrame derived state (collected model
    * profiles, sketch bytes). Nothing is pinned on the context, so
    * [[clearCaches]] just clears them — a long-lived session's
    * per-sfDir entries don't accumulate, and a post-clear rebuild
    * re-derives from parquet like the DataFrame caches. */
  private val auxCaches = scala.collection.mutable.ArrayBuffer
    .empty[scala.collection.concurrent.TrieMap[String, _]]

  private[graft] def registerAuxCache[T]()
      : scala.collection.concurrent.TrieMap[String, T] = {
    val c = scala.collection.concurrent.TrieMap.empty[String, T]
    auxCaches.synchronized { auxCaches += c }
    c
  }

  // ─────────────── engine-pinned RDD tracking (round 12) ───────────────

  /** RDD ids pinned by ENGINE code — memo persists plus the
    * loop-internal `localCheckpoint`s inside query builds. The
    * [[clearCaches]] RDD sweep is scoped to THESE ids only (round-11
    * advice): the previous blanket `getPersistentRDDs` sweep evicted a
    * host application's own cached relations, and permanently broke any
    * host-owned localCheckpointed RDD (checkpoint blocks cannot be
    * recomputed). Tracking is delta-capture around every engine entry
    * point — [[SparkEntry.queries]] wraps each query function in
    * [[trackPins]] — which is sufficient because RDD persistence
    * registers in `sc.persistentRdds` at the `persist()`/
    * `localCheckpoint()` CALL (plan construction), not at
    * materialization, so even lazy checkpoints land inside the window.
    * Best-effort in a host that persists concurrently INSIDE an engine
    * call window (such an RDD would be claimed); exact under the
    * driver's one-shot protocol and any engine-dedicated session. */
  private val pinnedRddIds = scala.collection.mutable.Set.empty[Int]

  /** Pins recorded per (applicationId, query-slot) by the LAST
    * invocation — see the release note on [[trackPins]]. */
  private val slotPins =
    scala.collection.mutable.HashMap.empty[String, Set[Int]]

  /** Delta-capture the RDDs a query build pins; when `slot` names the
    * query (SparkEntry passes its id), ALSO release the pins the
    * PREVIOUS invocation of the same query recorded (minus memo-build
    * pins, which outlive invocations — see [[memoPins]]). Without the
    * release, a bench session (3 runs × 418 queries) accumulates one
    * dead copy of every per-invocation localCheckpoint per run —
    * round 12 measured the resulting storage/GC churn as multi-second
    * inflation on otherwise sub-second rows, and round-11 ADVICE
    * flagged the q_dedup_minhash_w instance of the same leak. */
  private[graft] def trackPins[T](spark: SparkSession, slot: String = "")(
      body: => T): T =
    pinnedRddIds.synchronized {
      val sc = spark.sparkContext
      if (slot.nonEmpty) {
        val key = s"${sc.applicationId}:$slot"
        // Release ONLY locally-checkpointed RDDs: a memoized relation
        // whose cache buffer happens to MATERIALIZE inside a query's
        // construction window (loop queries run actions while building)
        // registers here without being a memo-build pin, and
        // unpersisting it would silently demote the shared cache to
        // recompute-per-use (round 12: q_graph_pagerank 2.9 → 7.3 s
        // when the first slot-release draft swept minhashPairs' buffer).
        // Per-invocation localCheckpoints are the only thing a dead
        // invocation can leak storage through, and a cache buffer is
        // never checkpointed. (isCheckpointed is also false for a lazy
        // checkpoint that never materialized — which holds no blocks,
        // so leaving it pinned costs nothing.)
        val stale = slotPins.getOrElse(key, Set.empty)
          .filterNot(memoPins.contains)
          .filter(id => sc.getPersistentRDDs.get(id)
            .exists(_.isCheckpointed))
        stale.foreach { id =>
          sc.getPersistentRDDs.get(id).foreach { rdd =>
            try rdd.unpersist(blocking = false)
            catch { case scala.util.control.NonFatal(_) => () }
          }
        }
        pinnedRddIds --= stale
      }
      val before = sc.getPersistentRDDs.keySet
      val out = body
      val fresh = sc.getPersistentRDDs.keySet.diff(before)
      pinnedRddIds ++= fresh
      if (slot.nonEmpty)
        slotPins(s"${sc.applicationId}:$slot") = fresh.toSet
      out
    }

  /** Release every relation the engine has pinned this session: every
    * registered memo entry is unpersisted and dropped, then any
    * ENGINE-pinned RDD still cached on the context (the loop-internal
    * `localCheckpoint`s living inside memoized lineages, which
    * DataFrame.unpersist cannot reach — identified via [[trackPins]])
    * is unpersisted too. Host-owned persisted/checkpointed RDDs and
    * cached relations are NOT touched (round-11 advice: a blanket
    * sweep permanently broke host localCheckpoints). Call between SF
    * sweeps in a long-lived session; after the call, previously
    * returned memoized DataFrames are INVALID (their checkpoint blocks
    * are gone) — consumers must re-request, which rebuilds from the
    * parquet sources. The one-shot drivers (Verify/Bench/Smoke) never
    * need this. */
  def clearCaches(spark: SparkSession): Unit = dfCaches.synchronized {
    dfCaches.foreach { c =>
      c.values.foreach(df =>
        try df.unpersist(true)
        catch { case scala.util.control.NonFatal(_) => () })
      c.clear()
    }
    auxCaches.synchronized { auxCaches.foreach(_.clear()) }
    pinnedRddIds.synchronized {
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (pinnedRddIds(id))
          try rdd.unpersist(true)
          catch { case scala.util.control.NonFatal(_) => () }
      }
      pinnedRddIds.clear()
      slotPins.clear()
    }
    memoPins.clear()
  }

  // Tokenized documents are reused by the whole §2.9 search family plus
  // several §2.10 pipeline ops; persist once per (session, sfDir).
  private val tokenCache =
    registerCache()

  /** (doc_id, term) token stream. The corpus is space-joined single-space
    * lowercase tokens with no empties (SURVEY.md §1.2), so a plain split
    * is exact tokenization.
    */
  def tokens(spark: SparkSession, sfDir: String): DataFrame = {
    val key = s"${spark.sparkContext.applicationId}:$sfDir"
    memo(tokenCache, key) {
      t(spark, sfDir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .persist()
    }
  }

  /** Distinct (doc_id, term) pairs — posting-list input. Deliberately
    * NOT persisted in its own right (round-12 interleaved A/B): a
    * docTerms cache was measured slower for EVERY consumer class —
    * filtered consumers lose term/doc pushdown through the cache
    * boundary (q_index_merge 0.25 vs 0.8 s, q_search_boolean 0.2 vs
    * 0.6), and even the full-relation self-join consumer paid more for
    * the string-heavy cache scans than the pipelined distinct from the
    * already-cached token stream saves (q_cooccur_pmi 1.0–1.8 plain vs
    * 1.4–2.1 cached warm). The memo belongs one level up, on the
    * aggregated relations (Search.df/dl, minhashPairs). */
  def docTerms(spark: SparkSession, sfDir: String): DataFrame =
    tokens(spark, sfDir).distinct()

  /** 3-token shingles of a corpus text column, shared by the fingerprint /
    * n-gram-dedup / contamination family. Docs with fewer than 3 tokens
    * yield the whole text as their single shingle — the oracle SQL mirrors
    * the same CASE — so short docs can't hit out-of-bounds element_at
    * (ANSI mode) or a null-propagating concat that diverges from DuckDB.
    */
  def shingles3(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    shingles3Arr(split(text, " "), text)

  // The distinct shingle relation feeds ≥6 §2.10 consumers (boilerplate,
  // source-overlap, decontam, ngram-dedup×2, fingerprint, novelty,
  // contamination); without the memo the explode+distinct runs once per
  // consumer — it was the slowest row of the round-8 graded bench
  // (q_boilerplate computed it in two plan branches).
  private val shingleCache =
    registerCache()

  /** Distinct (doc_id, source, sh) 3-token-shingle relation over the
    * corpus, persisted once per (session, sfDir) — the [[tokens]]
    * discipline. `doc_id` is unique, so the distinct over
    * (doc_id, source, sh) is exactly the distinct over (doc_id, sh) with
    * the functional `source` carried along; consumers that need
    * (source, sh) or a doc_id-sample re-distinct/filter the CACHED rows
    * instead of re-exploding the corpus. At cluster scale this is the
    * "materialize the shared shingle table once" move a real pipeline
    * makes; locally `.persist()` (memory-and-disk) bounds the cost to
    * one explode + one distinct shuffle per session.
    */
  def shingles(spark: SparkSession, sfDir: String): DataFrame = {
    val key = s"${spark.sparkContext.applicationId}:$sfDir"
    memo(shingleCache, key) {
      t(spark, sfDir, "documents")
        .withColumn("arr", split(col("text"), " "))
        .select(col("doc_id"), col("source"),
          explode(shingles3Arr(col("arr"), col("text"))).as("sh"))
        .distinct()
        .persist()
    }
  }

  /** Variant taking a pre-bound token-array column. Callers on a hot path
    * must `withColumn("arr", split(...))` first and pass that attribute:
    * inlining the split here puts it inside the transform lambda, where
    * it re-evaluates per shingle — O(len²) per doc (3× measured on the
    * fingerprint family at sf0.1).
    */
  /** 60-bit content-hash bucket: first 15 hex chars of md5(c) as a
    * BIGINT. EXACTLY 15 chars — 60 bits — so the long can never go
    * negative, matching DuckDB's `('0x' || substring(md5(x),1,15))
    * ::BIGINT`; a 16-char copy would overflow to negative buckets and
    * silently break every keep-rate / split comparison. Callers apply
    * their own modulus (split %100, sampling %1e6, simhash raw). ONE
    * definition for the four bucket-hash queries. */
  def md5Bucket(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Adjacent-token pairs of a token array — zip the array against its
    * own 1-shifted tail; `combine` shapes each pair ("a b" string for
    * the n-gram counters, a (w1, w2) struct for collocations). ONE
    * definition for the three bigram-expansion queries (q_ngrams,
    * q_ngram_lm, q_collocation), the md5Bucket/shingles3 precedent: a
    * slice off-by-one edited into one copy cannot silently miss the
    * others. Built inside a single projection — no self-join, and no
    * per-element re-split (the element_at(split(...)) trap). */
  def bigramsArr(arr: org.apache.spark.sql.Column)(
      combine: (org.apache.spark.sql.Column, org.apache.spark.sql.Column)
        => org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    zip_with(
      slice(arr, lit(1), size(arr) - 1),
      slice(arr, lit(2), size(arr) - 1),
      combine)

  def shingles3Arr(arr: org.apache.spark.sql.Column,
      text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(size(arr) >= 3,
      transform(sequence(lit(1), size(arr) - 2),
        i => concat_ws(" ",
          element_at(arr, i),
          element_at(arr, i + 1),
          element_at(arr, i + 2))))
      .otherwise(array(text))

  /** DuckDB rendering of [[shingles3]] — interpolate over a relation that
    * exposes `text` and `arr` (= string_split(text, ' ')). */
  val shingles3Sql: String =
    """CASE WHEN len(arr) >= 3
      |  THEN list_transform(generate_series(1, len(arr) - 2),
      |    i -> arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2])
      |  ELSE [text] END""".stripMargin

  /** DuckDB rendering of [[graft.functions.Fnv1a64]] over a byte-value
    * list expression: fold (xor → ×prime) in HUGEINT, reduced mod 2⁶⁴
    * each step (a UBIGINT multiply would raise on overflow; the ≤2⁶⁴ ×
    * ≤2⁴¹ product stays inside signed 128-bit). `list_prepend` seeds the
    * offset basis so an empty byte list folds to the basis, matching
    * `Fnv1a64.hash(Array.empty)`. ONE definition for the four
    * FNV-oracled rows (x_expr_custom, q_mm_decode via its hash input,
    * q_mm_frames) — SchemaCanarySpec pins the ASCII precondition these
    * oracles share (see [[asciiBytesSql]]). */
  def fnv1a64Sql(byteListExpr: String): String =
    s"""list_reduce(list_prepend(14695981039346656037::HUGEINT, $byteListExpr),
       |  (acc, b) -> (xor(acc, b) * 1099511628211::HUGEINT)
       |              % 18446744073709551616::HUGEINT)""".stripMargin

  /** UTF-8 byte values of an ASCII string column as a HUGEINT list.
    * `unicode(char)` equals the byte ONLY for ASCII input — the driver
    * corpus is pure ASCII (SchemaCanarySpec asserts it, failing loud
    * with a pointer here if a regeneration ever ships non-ASCII text).
    * The `c <> ''` guard keeps an empty string from feeding
    * `unicode('')` (string_split('','') yields ['']). */
  def asciiBytesSql(strExpr: String): String =
    s"[unicode(c)::HUGEINT for c in string_split($strExpr, '') if c <> '']"

  /** Two's-complement view of an unsigned-64 HUGEINT — what Spark's
    * LongType holds for the same bit pattern. */
  def toSignedLongSql(hugeExpr: String): String =
    s"""CAST(CASE WHEN $hugeExpr >= 9223372036854775808::HUGEINT
       |  THEN $hugeExpr - 18446744073709551616::HUGEINT
       |  ELSE $hugeExpr END AS BIGINT)""".stripMargin

  // app -> sfDir the views currently point at; registration is skipped
  // only when unchanged (round 12: q_sql_api re-registered all 10 views
  // per invocation — 10 parquet footer/schema reads per bench run for
  // identical view definitions). Registered as an aux cache so
  // clearCaches() forces re-registration afterwards.
  private val viewsFor = registerAuxCache[String]()

  /** Register the standard tables as temp views for spark.sql queries.
    * Events is registered with the ts already normalized to µs timestamps.
    * Idempotent per (session, sfDir); re-pointing to a different sfDir
    * re-registers everything.
    */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    viewsFor.synchronized {
      val app = spark.sparkContext.applicationId
      if (!viewsFor.get(app).contains(sfDir)) {
        Seq("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "documents", "embeddings").foreach { name =>
          t(spark, sfDir, name).createOrReplaceTempView(name)
        }
        events(spark, sfDir).createOrReplaceTempView("events")
        viewsFor.put(app, sfDir)
      }
    }
}

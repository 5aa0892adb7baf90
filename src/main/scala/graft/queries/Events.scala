package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Batch event analytics over the `events` stream table (SURVEY.md §2.12):
  * tumbling/sliding windows, sessionization, funnels. The same logical ops
  * run as Structured Streaming in graft.streaming.Streams.
  */
object Events {

  /** 30-min inactivity gap, µs. The ONE session definition shared by
    * qEvtSession, qJoinInterval and EventsPlus.qEvtBounce. */
  private[queries] val SessionGapUs = 1800000000L

  /** Shared sessionization: lag → break flag → running sum as session
    * id, one window shuffle per user. Adds `ts_us` (µs) and
    * `session_id` (1-based per user) to the events table. Centralized
    * like Tables.tokens so the gap constant and the (ts_us, event_id)
    * tie-break cannot silently diverge between the three operators
    * that sessionize. */
  private[queries] def sessionized(spark: SparkSession, sfDir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    Tables.events(spark, sfDir)
      .withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("gap",
        when(col("ts_us") - lag("ts_us", 1).over(byUser) > SessionGapUs, 1)
          .otherwise(when(lag("ts_us", 1).over(byUser).isNull, 1).otherwise(0)))
      .withColumn("session_id", sum("gap").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("gap")
  }

  def qEvtTumbling(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(date_trunc("hour", col("ts")).as("hr"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("total"))
      .orderBy("hr", "event_type")

  val qEvtTumblingSql: String =
    """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr, event_type,
      |  count(*) AS n, round(sum(value), 4) AS total
      |FROM events GROUP BY hr, event_type ORDER BY hr, event_type""".stripMargin

  /** 1h windows sliding every 15min. Spark's window() assigns each event to
    * its 4 containing slide buckets; the oracle generates the same buckets
    * arithmetically (window starts are epoch-aligned in both). */
  def qEvtSliding(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("total"))
      .select(col("window.start").as("win_start"), col("n"), col("total"))
      .orderBy("win_start")

  val qEvtSlidingSql: String =
    """SELECT CAST(to_timestamp(
      |    floor(epoch(CAST(ts AS TIMESTAMP)) / 900) * 900 - k * 900)
      |    AS TIMESTAMP) AS win_start,
      |  count(*) AS n, round(sum(value), 4) AS total
      |FROM events, unnest(generate_series(0, 3)) AS t(k)
      |GROUP BY win_start ORDER BY win_start""".stripMargin

  /** Sessionization with a 30-min inactivity gap: lag → gap flag → running
    * sum as session id — all window functions, shuffle-once per user. */
  def qEvtSession(spark: SparkSession, sfDir: String): DataFrame = {
    sessionized(spark, sfDir)
      .groupBy("user_id", "session_id")
      // `div` (integer division) on both sides: DuckDB CAST(double AS
      // BIGINT) rounds half-even while Spark cast truncates.
      .agg(count(lit(1)).as("n_events"),
        expr("(max(ts_us) - min(ts_us)) div 1000000").as("dur_sec"),
        min("ts").as("start_ts"))
      .orderBy("user_id", "session_id")
  }

  /** Oracle-side sessionization chain (e → flagged → sess) — the SQL
    * twin of [[sessionized]], gap interpolated from [[SessionGapUs]].
    * ONE definition for both session oracles (q_evt_session,
    * q_join_interval), so the gap constant or tie-break edited on the
    * Scala side cannot silently diverge from either SQL copy. */
  private val sessCte: String =
    s"""e AS (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP))
      |    AS ts_us, CAST(ts AS TIMESTAMP) AS tss FROM events),
      |flagged AS (SELECT *, CASE WHEN ts_us - lag(ts_us) OVER w
      |    > $SessionGapUs OR lag(ts_us) OVER w IS NULL THEN 1 ELSE 0 END
      |    AS gap
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      |sess AS (SELECT *, CAST(sum(gap) OVER (PARTITION BY user_id
      |    ORDER BY ts_us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND
      |    CURRENT ROW) AS BIGINT) AS session_id FROM flagged)""".stripMargin

  val qEvtSessionSql: String =
    s"""WITH $sessCte
      |SELECT user_id, session_id, count(*) AS n_events,
      |  (max(ts_us) - min(ts_us)) // 1000000 AS dur_sec,
      |  min(tss) AS start_ts
      |FROM sess GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  /** signup→purchase funnel per user: earliest signup, earliest purchase at
    * or after it, conversion flag. Conditional aggregation, single shuffle. */
  def qEvtFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val signup = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("signup_ts"))
    val purchase = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"))
    signup
      .join(purchase, Seq("user_id"), "left")
      // conditional min instead of a row filter: a user whose purchases
      // all precede signup must still appear (with NULL), matching the
      // oracle's correlated-subquery semantics
      .groupBy("user_id", "signup_ts")
      .agg(min(when(col("p_ts") >= col("signup_ts"), col("p_ts")))
        .as("first_purchase_ts"))
      .withColumn("converted", col("first_purchase_ts").isNotNull)
      .orderBy("user_id")
  }

  val qEvtFunnelSql: String =
    """WITH s AS (SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS signup_ts
      |  FROM events WHERE event_type = 'signup' GROUP BY user_id)
      |SELECT s.user_id, s.signup_ts,
      |  (SELECT min(CAST(e.ts AS TIMESTAMP)) FROM events e
      |   WHERE e.user_id = s.user_id AND e.event_type = 'purchase'
      |     AND CAST(e.ts AS TIMESTAMP) >= s.signup_ts) AS first_purchase_ts,
      |  (SELECT min(CAST(e.ts AS TIMESTAMP)) FROM events e
      |   WHERE e.user_id = s.user_id AND e.event_type = 'purchase'
      |     AND CAST(e.ts AS TIMESTAMP) >= s.signup_ts) IS NOT NULL
      |    AS converted
      |FROM s ORDER BY user_id""".stripMargin

  /** Cohort retention: users grouped by first-seen day, distinct actives
    * per (cohort, day offset). Two hash shuffles (first-seen agg + the
    * cohort re-agg); the self-join is on user_id, the natural partition
    * key of an events stream at scale.
    */
  def qEvtRetention(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), date_trunc("day", col("ts")).as("d"))
    val first = ev.groupBy("user_id").agg(min("d").as("cohort_day"))
    ev.join(first, "user_id")
      .withColumn("day_offset",
        datediff(col("d"), col("cohort_day")).cast("long"))
      .groupBy("cohort_day", "day_offset")
      .agg(countDistinct("user_id").as("n_users"))
      .orderBy("cohort_day", "day_offset")
  }

  val qEvtRetentionSql: String =
    """WITH ev AS (SELECT user_id,
      |    date_trunc('day', CAST(ts AS TIMESTAMP)) AS d FROM events),
      |f AS (SELECT user_id, min(d) AS d0 FROM ev GROUP BY user_id),
      |r AS (SELECT f.d0,
      |    date_diff('day', CAST(f.d0 AS DATE), CAST(ev.d AS DATE)) AS off,
      |    count(DISTINCT ev.user_id) AS n_users
      |  FROM ev JOIN f ON ev.user_id = f.user_id
      |  GROUP BY f.d0, off)
      |SELECT CAST(d0 AS TIMESTAMP) AS cohort_day, off AS day_offset,
      |  n_users
      |FROM r ORDER BY cohort_day, day_offset""".stripMargin

  /** Statistical outliers: z-score of value against the per-event-type
    * mean/stddev, top-20 by |z|. One partial+final agg to build the tiny
    * per-type stats dim (broadcast back), one narrow scoring pass.
    */
  def qEvtAnomaly(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val stats = ev.groupBy(col("event_type").as("et"))
      .agg(avg("value").as("mu"), stddev_samp("value").as("sigma"))
      // a constant-valued group has sigma = 0: Spark's x/0 is NULL but
      // DuckDB's is NaN (which sorts FIRST under DESC) — exclude
      // degenerate groups on both sides instead
      .filter(col("sigma") > 0)
    ev.join(broadcast(stats), col("event_type") === col("et"))
      .select(col("event_id"), col("event_type"), col("value"),
        round((col("value") - col("mu")) / col("sigma"), 4).as("z"))
      .orderBy(abs(col("z")).desc, col("event_id").asc)
      .limit(20)
  }

  val qEvtAnomalySql: String =
    """WITH s AS (SELECT * FROM (SELECT event_type AS et, avg(value) AS mu,
      |    stddev_samp(value) AS sigma FROM events GROUP BY event_type)
      |  WHERE sigma > 0)
      |SELECT event_id, event_type, value,
      |  round((value - mu) / sigma, 4) AS z
      |FROM events JOIN s ON event_type = et
      |ORDER BY abs(round((value - mu) / sigma, 4)) DESC, event_id
      |LIMIT 20""".stripMargin

  /** First-order Markov transitions between consecutive events of each
    * user: count and probability of event_type B following A. One
    * user-keyed window pass (the events stream's natural partitioning);
    * the normalizing window runs over the |types|² transition matrix,
    * not the corpus.
    */
  def qEvtMarkov(spark: SparkSession, sfDir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val trans = Tables.events(spark, sfDir)
      .withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("next_type", lead("event_type", 1).over(byUser))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
    // probability in parts-per-million via integer division: exact on
    // every engine, no round-half-grid hazard (skill gotcha: round(4)
    // of small-count ratios)
    trans
      .withColumn("p_ppm",
        expr("(n * 1000000) div sum(n) over (partition by prev_type)"))
      .orderBy("prev_type", "next_type")
  }

  val qEvtMarkovSql: String =
    """WITH e AS (SELECT user_id, event_id, event_type,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
      |nx AS (SELECT event_type AS prev_type, lead(event_type) OVER
      |    (PARTITION BY user_id ORDER BY ts_us, event_id) AS next_type
      |  FROM e),
      |t AS (SELECT prev_type, next_type, count(*) AS n FROM nx
      |  WHERE next_type IS NOT NULL GROUP BY prev_type, next_type)
      |SELECT prev_type, next_type, n,
      |  CAST((n * 1000000) // sum(n) OVER (PARTITION BY prev_type)
      |    AS BIGINT) AS p_ppm
      |FROM t ORDER BY prev_type, next_type""".stripMargin

  /** Interval-overlap join without a native IEJoin: count ALL events
    * (any user) inside each session's [lo, hi] window. The scale path is
    * bucketization — sessions explode to the 30-min buckets they span,
    * events carry their single containing bucket, the join is an
    * EQUI-join on bucket followed by the exact BETWEEN filter. An event
    * lives in exactly one bucket, so each (session, event) pair
    * materializes at most once — no dedup pass. The naive form is a
    * BNLJ over sessions×events; PlanAuditSpec asserts it never appears.
    */
  def qJoinInterval(spark: SparkSession, sfDir: String): DataFrame = {
    val B = SessionGapUs // bucket width = the session gap
    val ev = Tables.events(spark, sfDir)
      .withColumn("ts_us", unix_micros(col("ts")))
    val sess = sessionized(spark, sfDir)
      .groupBy(col("user_id").as("s_user"), col("session_id"))
      .agg(min("ts_us").as("lo"), max("ts_us").as("hi"))
    val sessBuckets = sess.withColumn("bucket",
      explode(expr(s"sequence(lo div $B, hi div $B)")))
    val evBuckets = ev.select(col("ts_us"), expr(s"ts_us div $B").as("bucket"))
    sessBuckets.join(evBuckets, "bucket")
      .filter(col("ts_us") >= col("lo") && col("ts_us") <= col("hi"))
      .groupBy("s_user", "session_id")
      .agg(count(lit(1)).as("n_overlap"))
      .orderBy("s_user", "session_id")
  }

  val qJoinIntervalSql: String =
    s"""WITH $sessCte,
      |iv AS (SELECT user_id AS s_user, session_id,
      |    min(ts_us) AS lo, max(ts_us) AS hi
      |  FROM sess GROUP BY user_id, session_id)
      |SELECT iv.s_user, iv.session_id, count(*) AS n_overlap
      |FROM iv JOIN e ON e.ts_us BETWEEN iv.lo AND iv.hi
      |GROUP BY iv.s_user, iv.session_id
      |ORDER BY iv.s_user, iv.session_id""".stripMargin

  /** Time-series resample: 5-min buckets per event_type with explicit
    * zero rows for empty buckets — the gap-fill a downstream model needs
    * dense input for. The bucket grid is generated from the (broadcast)
    * min/max bound, |grid| = time-range/5min × |types| ≪ events, so the
    * left join is grid-sized, never corpus-sized.
    */
  def qEvtResample(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      // `div` (integer division): Column `/` on longs yields DOUBLE
      .withColumn("bucket",
        timestamp_seconds(expr("(unix_micros(ts) div 300000000) * 300")))
    val agg = ev.groupBy("bucket", "event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("total"))
    val bounds = ev.agg(min("bucket").as("lo"), max("bucket").as("hi"))
    val grid = bounds
      .select(explode(sequence(col("lo"), col("hi"),
        expr("INTERVAL 5 MINUTES"))).as("bucket"))
      .crossJoin(ev.select("event_type").distinct())
    grid.join(agg, Seq("bucket", "event_type"), "left")
      .select(col("bucket"), col("event_type"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("total"), lit(0.0)).as("total"))
      .orderBy("bucket", "event_type")
  }

  val qEvtResampleSql: String =
    """WITH e AS (SELECT CAST(to_timestamp(
      |      floor(epoch(CAST(ts AS TIMESTAMP)) / 300) * 300)
      |      AS TIMESTAMP) AS bucket, event_type, value FROM events),
      |agg AS (SELECT bucket, event_type, count(*) AS n,
      |    round(sum(value), 4) AS total
      |  FROM e GROUP BY bucket, event_type),
      |grid AS (SELECT g.g AS bucket, t.event_type
      |  FROM (SELECT unnest(generate_series(
      |      (SELECT min(bucket) FROM e), (SELECT max(bucket) FROM e),
      |      INTERVAL 5 MINUTE)) AS g) g,
      |    (SELECT DISTINCT event_type FROM e) t)
      |SELECT grid.bucket, grid.event_type,
      |  coalesce(agg.n, 0) AS n, coalesce(agg.total, 0.0) AS total
      |FROM grid LEFT JOIN agg
      |  ON grid.bucket = agg.bucket AND grid.event_type = agg.event_type
      |ORDER BY grid.bucket, grid.event_type""".stripMargin
}

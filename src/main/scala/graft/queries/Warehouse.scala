package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Warehouse maintenance operators (SURVEY.md §2.15): latest-wins upsert
  * (the MERGE INTO shape) and SCD type-2 interval building.
  *
  * Scale notes: both are one hash shuffle on their natural key (merge
  * key / user), with windows partitioned by that key — no global state.
  */
object Warehouse {

  /** Latest-record-wins merge: a deterministic "update batch" (every
    * 10th order, price +100, version 2) upserts into the base table;
    * per-key the highest version survives. The per-status aggregate of
    * the merged table proves updates won and inserts were kept — the
    * semantics of MERGE INTO without a mutable table format.
    *
    * Money is summed as integer CENTS (the qRfm / q_incremental_agg
    * precedent), divided back once at the end: a double sum over ~15k
    * prices reaches ~1.2e10 at sf0.1, where Spark's partial-sum order
    * vs DuckDB's sequential accumulation differ by ~5e-5 — enough to
    * cross the round(4) grid (caught by the sf0.1 oracle sweep; the
    * sf0.01 gate never sees it). Cents sums are exact in both engines.
    */
  def qUpsertLatest(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.t(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    val base = orders.withColumn("version", lit(1))
    val upd = orders.filter(col("o_orderkey") % 10 === 0)
      .withColumn("cents", col("cents") + 10000L)
      .withColumn("version", lit(2))
    val w = Window.partitionBy("o_orderkey").orderBy(desc("version"))
    base.unionByName(upd)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        (sum("cents").cast("double") / 100.0).as("total"))
      .orderBy("o_orderstatus")
  }

  val qUpsertLatestSql: String =
    """WITH base AS (SELECT o_orderkey, o_orderstatus,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
      |    1 AS version FROM orders),
      |upd AS (SELECT o_orderkey, o_orderstatus, cents + 10000,
      |    2 AS version FROM base WHERE o_orderkey % 10 = 0),
      |u AS (SELECT * FROM base UNION ALL SELECT * FROM upd),
      |m AS (SELECT *, row_number() OVER (PARTITION BY o_orderkey
      |    ORDER BY version DESC) AS rn FROM u)
      |SELECT o_orderstatus, count(*) AS n,
      |  CAST(sum(cents) AS DOUBLE) / 100.0 AS total
      |FROM m WHERE rn = 1
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** SCD type-2 interval building from the event stream: every change
    * of a user's event_type closes the previous state row and opens a
    * new one with [valid_from, valid_to) bounds (valid_to NULL = the
    * current state). lag detects the change, the running change-count
    * is the interval id, lead supplies the closing bound — all windows
    * partitioned by user.
    */
  /** The SCD2 interval relation (user_id, state, valid_from, valid_to,
    * n_events) — shared by [[qScd2]] (the build) and [[qScd2Pit]] (the
    * point-in-time lookup) so the change-detection chain cannot
    * diverge between them. */
  private def scd2Intervals(spark: SparkSession, sfDir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val intervals = Tables.events(spark, sfDir)
      .withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("chg",
        when(lag("event_type", 1).over(byUser).isNull ||
          col("event_type") =!= lag("event_type", 1).over(byUser), 1)
          .otherwise(0))
      .withColumn("grp", sum("chg").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("grp"), col("event_type").as("state"))
      .agg(min("ts").as("valid_from"), count(lit(1)).as("n_events"))
    val byGrp = Window.partitionBy("user_id").orderBy("grp")
    intervals
      .withColumn("valid_to", lead("valid_from", 1).over(byGrp))
  }

  def qScd2(spark: SparkSession, sfDir: String): DataFrame = {
    scd2Intervals(spark, sfDir)
      .select("user_id", "state", "valid_from", "valid_to", "n_events")
      // Sort on EVERY output column: same-µs state flips make
      // (user_id, valid_from) tie, and three alternating flips at one
      // µs even tie (user_id, valid_from, state) across NON-adjacent
      // intervals — but rows tying on all five columns are identical
      // rows, so the full-column key is effectively total (rule A).
      // valid_to is NULL for each user's open interval: pin NULLS LAST
      // explicitly on both engines (Spark's asc default is nulls FIRST,
      // DuckDB's is nulls last — an unpinned tie would diverge).
      .orderBy(col("user_id"), col("valid_from"), col("state"),
        col("valid_to").asc_nulls_last, col("n_events"))
  }

  val qScd2Sql: String =
    """WITH e AS (SELECT user_id, event_id, event_type,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
      |    CAST(ts AS TIMESTAMP) AS tss FROM events),
      |c AS (SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
      |      OR event_type <> lag(event_type) OVER w THEN 1 ELSE 0 END
      |    AS chg FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      |g AS (SELECT *, CAST(sum(chg) OVER (PARTITION BY user_id
      |    ORDER BY ts_us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND
      |    CURRENT ROW) AS BIGINT) AS grp FROM c),
      |iv AS (SELECT user_id, grp, event_type AS state,
      |    min(tss) AS valid_from, count(*) AS n_events
      |  FROM g GROUP BY user_id, grp, event_type)
      |SELECT user_id, state, valid_from,
      |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY grp)
      |    AS valid_to, n_events
      |FROM iv ORDER BY user_id, valid_from, state,
      |  valid_to ASC NULLS LAST, n_events""".stripMargin

  /** Snapshot diff (CDC without a log): compare two table versions by
    * key and classify every row as added / removed / changed / same —
    * one full-outer join on the key, the shape incremental pipelines
    * use to derive a changefeed from periodic snapshots. The "new"
    * snapshot is derived deterministically (drop keys ≡0 mod 7, bump
    * price on keys ≡1 mod 5, add negated keys — collision-free with the
    * non-negative real key space at any SF).
    */
  def qSnapshotDiff(spark: SparkSession, sfDir: String): DataFrame = {
    // money as integer cents — see qUpsertLatest's scaladoc: the
    // added/removed buckets sum FULL prices (±3.2e9 at sf0.1), inside
    // the float-sum boundary BASELINE.md's convention flags
    val base = Tables.t(spark, sfDir, "orders")
      .select(col("o_orderkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    val old = base.select(col("o_orderkey").as("k"), col("cents").as("c_old"))
    val nw = base
      .filter(col("o_orderkey") % 7 =!= 0)
      .select(col("o_orderkey").as("k"),
        when(col("o_orderkey") % 5 === 1, col("cents") + 5000L)
          .otherwise(col("cents")).as("c_new"))
      .unionByName(base
        .filter(col("o_orderkey") % 11 === 0)
        // synthesized "added" keys are NEGATIVE: real orderkeys are a
        // dense non-negative space, so -(k+1) can never collide at any
        // SF — a fixed +1e6 shift collides with real keys once the
        // table passes 1e6 rows (~TPC-H sf0.7) and silently turns
        // 'added' rows into fanned-out 'changed' ones
        .select((-col("o_orderkey") - 1).as("k"),
          col("cents").as("c_new")))
    old.join(nw, Seq("k"), "full_outer")
      .withColumn("change",
        when(col("c_old").isNull, "added")
          .when(col("c_new").isNull, "removed")
          .when(col("c_old") =!= col("c_new"), "changed")
          .otherwise("same"))
      .groupBy("change")
      .agg(count(lit(1)).as("n"),
        (sum(coalesce(col("c_new"), lit(0L)) -
          coalesce(col("c_old"), lit(0L))).cast("double") / 100.0)
          .as("net_delta"))
      .orderBy("change")
  }

  val qSnapshotDiffSql: String =
    """WITH src AS (SELECT o_orderkey,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
      |old AS (SELECT o_orderkey AS k, cents AS c_old FROM src),
      |nw AS (SELECT o_orderkey AS k,
      |    CASE WHEN o_orderkey % 5 = 1 THEN cents + 5000
      |      ELSE cents END AS c_new
      |  FROM src WHERE o_orderkey % 7 <> 0
      |  UNION ALL
      |  SELECT -o_orderkey - 1, cents FROM src
      |  WHERE o_orderkey % 11 = 0),
      |d AS (SELECT CASE WHEN c_old IS NULL THEN 'added'
      |      WHEN c_new IS NULL THEN 'removed'
      |      WHEN c_old <> c_new THEN 'changed' ELSE 'same' END AS change,
      |    coalesce(c_new, 0) - coalesce(c_old, 0) AS delta
      |  FROM old FULL OUTER JOIN nw USING (k))
      |SELECT change, count(*) AS n,
      |  CAST(sum(delta) AS DOUBLE) / 100.0 AS net_delta
      |FROM d GROUP BY change ORDER BY change""".stripMargin

  /** Z-order (Morton) layout key: interleave the bits of two clamped
    * 16-bit dimensions so range predicates on EITHER dimension prune
    * contiguous key ranges — the multi-dimensional data-layout trick
    * behind Delta/Iceberg OPTIMIZE ZORDER, computed as a pure codegen
    * expression (no shuffle; the sort that would follow at scale is the
    * standard range partition). Top-40 parts by z-value.
    */
  def qZorder(spark: SparkSession, sfDir: String): DataFrame = {
    // floor() BEFORE the long cast on both engines: Spark's cast
    // truncates but DuckDB's CAST(DOUBLE AS BIGINT) rounds half-even
    val x = least(col("p_size").cast("long"), lit(65535L))
    val y = least(floor(col("p_retailprice") / 100).cast("long"), lit(65535L))
    // interleave via SQL aggregate over the 16 bit positions
    val z = expr(
      """aggregate(sequence(0, 15), 0L, (acc, k) ->
        |  acc
        |  + (((least(cast(p_size as bigint), 65535L) >> k) & 1) << (2 * k))
        |  + (((least(cast(floor(p_retailprice / 100) as bigint), 65535L) >> k) & 1)
        |      << (2 * k + 1)))""".stripMargin)
    Tables.t(spark, sfDir, "part")
      .select(col("p_partkey"), x.as("xd"), y.as("yd"), z.as("zval"))
      .orderBy(asc("zval"), asc("p_partkey"))
      .limit(40)
  }

  val qZorderSql: String =
    """SELECT p_partkey,
      |  least(CAST(p_size AS BIGINT), 65535) AS xd,
      |  least(CAST(floor(p_retailprice / 100) AS BIGINT), 65535) AS yd,
      |  CAST((SELECT sum(
      |      ((least(CAST(p_size AS BIGINT), 65535) >> k) & 1)
      |        * (1::BIGINT << (2 * k))
      |      + ((least(CAST(floor(p_retailprice / 100) AS BIGINT), 65535) >> k)
      |          & 1) * (1::BIGINT << (2 * k + 1)))
      |    FROM generate_series(0, 15) t(k)) AS BIGINT) AS zval
      |FROM part
      |ORDER BY zval, p_partkey LIMIT 40""".stripMargin

  /** CDC apply: replay an ordered change stream (INSERT / UPDATE /
    * DELETE with sequence numbers) onto a base snapshot — the Debezium/
    * changefeed consumer shape that upsert-latest alone can't express
    * because deletes must REMOVE rows. The stream is synthesized
    * deterministically from orders: base = keys ≢ 0 (mod 3); seq 1
    * inserts the missing third; seq 2 reprices every 5th key; seq 3
    * deletes every 7th key. Apply = per-key last-op-wins (row_number
    * over seq desc) then drop tombstones; one hash shuffle on the key,
    * window partitioned by the same key. The per-status aggregate
    * proves inserts landed, updates won, and deletes vanished.
    */
  def qCdcApply(spark: SparkSession, sfDir: String): DataFrame = {
    // money as integer cents — see qUpsertLatest's scaladoc: double sums
    // diverge from DuckDB past the round(4) grid at sf0.1 magnitudes
    val orders = Tables.t(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    val base = orders.filter(col("o_orderkey") % 3 =!= 0)
      .withColumn("seq", lit(0L)).withColumn("op", lit("I"))
    val ins = orders.filter(col("o_orderkey") % 3 === 0)
      .withColumn("seq", lit(1L)).withColumn("op", lit("I"))
    val upd = orders.filter(col("o_orderkey") % 5 === 0)
      .withColumn("cents", col("cents") + 50000L)
      .withColumn("seq", lit(2L)).withColumn("op", lit("U"))
    val del = orders.filter(col("o_orderkey") % 7 === 0)
      .withColumn("seq", lit(3L)).withColumn("op", lit("D"))
    val byKey = Window.partitionBy("o_orderkey").orderBy(desc("seq"))
    base.unionByName(ins).unionByName(upd).unionByName(del)
      .withColumn("rn", row_number().over(byKey))
      .filter(col("rn") === 1 && col("op") =!= "D")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        (sum("cents").cast("double") / 100.0).as("total"))
      .orderBy("o_orderstatus")
  }

  val qCdcApplySql: String =
    """WITH src AS (SELECT o_orderkey, o_orderstatus,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |    FROM orders),
      |log AS (
      |  SELECT *, 0 AS seq, 'I' AS op FROM src WHERE o_orderkey % 3 <> 0
      |  UNION ALL
      |  SELECT *, 1, 'I' FROM src WHERE o_orderkey % 3 = 0
      |  UNION ALL
      |  SELECT o_orderkey, o_orderstatus, cents + 50000, 2, 'U'
      |    FROM src WHERE o_orderkey % 5 = 0
      |  UNION ALL
      |  SELECT *, 3, 'D' FROM src WHERE o_orderkey % 7 = 0),
      |m AS (SELECT *, row_number() OVER (PARTITION BY o_orderkey
      |    ORDER BY seq DESC) AS rn FROM log)
      |SELECT o_orderstatus, count(*) AS n,
      |  CAST(sum(cents) AS DOUBLE) / 100.0 AS total
      |FROM m WHERE rn = 1 AND op <> 'D'
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Incremental materialized-view maintenance: the (status, day) daily
    * partial — count + integer-cents sum, the algebraic state a real MV
    * stores — re-aggregated to per-status totals with avg DERIVED from
    * the merged sums. The contract under test: merging partials equals
    * recomputing from facts (the oracle's direct scan). At 100 TB the
    * payoff is that a new day appends one partial row per key and the
    * final merge touches only the calendar-bounded MV, never the fact
    * history; cents keep both engines' sums exact (qRfm precedent).
    */
  def qIncrementalAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.t(spark, sfDir, "orders")
      .select(col("o_orderstatus"),
        to_date(col("o_orderdate")).as("day"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .groupBy("o_orderstatus", "day")
      .agg(count(lit(1)).as("cnt"), sum("cents").as("cents"))
    daily
      .groupBy("o_orderstatus")
      .agg(sum("cnt").cast("long").as("n_orders"),
        sum("cents").cast("long").as("total_cents"),
        count(lit(1)).as("n_days"))
      .withColumn("avg_price", round(
        col("total_cents").cast("double") / 100.0 / col("n_orders"), 4))
      .orderBy("o_orderstatus")
  }

  val qIncrementalAggSql: String =
    """WITH f AS (SELECT o_orderstatus,
      |    CAST(o_orderdate AS DATE) AS day,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders)
      |SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(cents) AS BIGINT) AS total_cents,
      |  CAST(count(DISTINCT day) AS BIGINT) AS n_days,
      |  round(CAST(sum(cents) AS DOUBLE) / 100.0 / count(*), 4)
      |    AS avg_price
      |FROM f GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ───────── open-order backlog (interval concurrency, no range join) ─────────

  /** Daily open-order backlog: how many orders are open (placed, not yet
    * fully shipped) on each day — interval concurrency counting, done the
    * scale-correct way. The naive formulation stabs every day into every
    * order interval (a days × orders range join — quadratic-ish and
    * unbroadcastable at corpus scale); this one converts each interval to
    * a +1 at open and a −1 the day after close, aggregates deltas per day
    * (partial-aggregable), and takes ONE running sum over the bounded
    * calendar (~2.5k rows at ANY sf — the qEvtChangepoint
    * bounded-window discipline). Per-order close = max ship date, one
    * fact pass on the orderkey. Counts are exact ints throughout.
    */
  def qOrderBacklog(spark: SparkSession, sfDir: String): DataFrame = {
    val spans = Tables.t(spark, sfDir, "lineitem")
      .groupBy("l_orderkey")
      .agg(max(col("l_shipdate").cast("date")).as("close_d"))
      .join(Tables.t(spark, sfDir, "orders")
        .select(col("o_orderkey"), col("o_orderdate").cast("date").as("open_d")),
        col("l_orderkey") === col("o_orderkey"))
    val deltas = spans.select(col("open_d").as("d"), lit(1L).as("delta"))
      .unionAll(spans.select(date_add(col("close_d"), 1).as("d"),
        lit(-1L).as("delta")))
      .groupBy("d").agg(sum("delta").as("net"))
    val w = Window.orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas
      .select(col("d").as("day"), col("net"),
        sum("net").over(w).as("open_orders"))
      .orderBy("day")
  }

  /** Order-fulfillment latency distribution per priority class — the
    * SLO view `o_orderpriority` exists for: per order, days from
    * placement to the LAST line shipment (one partial-aggregable
    * orderkey pass), then per priority the count, interpolated p50/p90
    * (exact-percentile over exact int days — the q_agg_percentile
    * parity), and integer-div mean. Synthetic-data caveat: the
    * generator draws order and ship dates independently, so negative
    * latencies exist locally; the distribution machinery is what's
    * exercised. Scale: fact rollup on the orderkey, join-back to the
    * priority attribute, 5-key percentile rollup.
    */
  def qFillLatency(spark: SparkSession, sfDir: String): DataFrame = {
    val close = Tables.t(spark, sfDir, "lineitem")
      .groupBy("l_orderkey")
      .agg(max(col("l_shipdate").cast("date")).as("close_d"))
    close
      .join(Tables.t(spark, sfDir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("o_orderdate").cast("date").as("open_d")),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("lat_d", datediff(col("close_d"), col("open_d")).cast("long"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        round(expr("percentile(lat_d, 0.5D)"), 1).as("p50_days"),
        round(expr("percentile(lat_d, 0.9D)"), 1).as("p90_days"),
        expr("sum(lat_d) DIV count(*)").as("mean_days"))
      .orderBy("o_orderpriority")
  }

  val qFillLatencySql: String =
    """WITH c AS (SELECT l_orderkey, CAST(max(l_shipdate) AS DATE) AS cd
      |  FROM lineitem GROUP BY 1),
      |f AS (SELECT o_orderpriority,
      |    CAST(date_diff('day', CAST(o_orderdate AS DATE), cd) AS BIGINT)
      |      AS lat_d
      |  FROM c JOIN orders ON l_orderkey = o_orderkey)
      |SELECT o_orderpriority, count(*) AS n_orders,
      |  round(percentile_cont(0.5) WITHIN GROUP (ORDER BY lat_d), 1)
      |    AS p50_days,
      |  round(percentile_cont(0.9) WITHIN GROUP (ORDER BY lat_d), 1)
      |    AS p90_days,
      |  CAST(sum(lat_d) // count(*) AS BIGINT) AS mean_days
      |FROM f GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  val qOrderBacklogSql: String =
    """WITH close AS (SELECT l_orderkey,
      |    CAST(max(l_shipdate) AS DATE) AS close_d
      |  FROM lineitem GROUP BY 1),
      |spans AS (SELECT CAST(o_orderdate AS DATE) AS open_d, close_d
      |  FROM close JOIN orders ON l_orderkey = o_orderkey),
      |deltas AS (SELECT open_d AS d, CAST(1 AS BIGINT) AS delta FROM spans
      |  UNION ALL SELECT close_d + 1, CAST(-1 AS BIGINT) FROM spans),
      |net AS (SELECT d, CAST(sum(delta) AS BIGINT) AS net
      |  FROM deltas GROUP BY d)
      |SELECT d AS day, net,
      |  CAST(sum(net) OVER (ORDER BY d
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS open_orders
      |FROM net ORDER BY day""".stripMargin

  // ───────── referential-integrity audit (round 7) ─────────

  /** Foreign-key orphan audit across the star schema's four FK edges —
    * the data-quality gate every warehouse load runs before publishing:
    * per edge, child row count and orphan count (child keys with no
    * parent). Each edge is ONE left join + aggregate (count + null-
    * parent sum in the same pass — no separate anti join); small parents
    * broadcast, fact-to-fact edges hash-join on the key, AQE picks per
    * edge. Output is 4 rows of exact ints.
    */
  def qFkOrphans(spark: SparkSession, sfDir: String): DataFrame = {
    def edge(name: String, child: DataFrame, ck: String,
        parent: DataFrame, pk: String): DataFrame =
      child.select(col(ck))
        .join(parent.select(col(pk)), col(ck) === col(pk), "left")
        .agg(count(lit(1)).as("n_child"),
          sum(when(col(pk).isNull, 1L).otherwise(0L)).as("n_orphans"))
        .select(lit(name).as("edge"), col("n_child"), col("n_orphans"))
    val li = Tables.t(spark, sfDir, "lineitem")
    edge("lineitem.l_orderkey->orders", li, "l_orderkey",
        Tables.t(spark, sfDir, "orders"), "o_orderkey")
      .unionAll(edge("lineitem.l_partkey->part", li, "l_partkey",
        Tables.t(spark, sfDir, "part"), "p_partkey"))
      .unionAll(edge("lineitem.l_suppkey->supplier", li, "l_suppkey",
        Tables.t(spark, sfDir, "supplier"), "s_suppkey"))
      .unionAll(edge("orders.o_custkey->customer",
        Tables.t(spark, sfDir, "orders"), "o_custkey",
        Tables.t(spark, sfDir, "customer"), "c_custkey"))
      .orderBy("edge")
  }

  val qFkOrphansSql: String =
    """SELECT * FROM (
      |SELECT 'lineitem.l_orderkey->orders' AS edge, count(*) AS n_child,
      |  CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_orphans
      |FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
      |UNION ALL
      |SELECT 'lineitem.l_partkey->part', count(*),
      |  CAST(sum(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END)
      |    AS BIGINT)
      |FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
      |UNION ALL
      |SELECT 'lineitem.l_suppkey->supplier', count(*),
      |  CAST(sum(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END)
      |    AS BIGINT)
      |FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |UNION ALL
      |SELECT 'orders.o_custkey->customer', count(*),
      |  CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
      |    AS BIGINT)
      |FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      |) ORDER BY edge""".stripMargin

  // ───────── incremental join-view maintenance (round 7) ─────────

  /** Incremental maintenance of a JOIN materialized view — per-nation
    * order count + revenue over orders ⋈ customer, maintained as
    * base-partition aggregate (orders before 2000-01-01) PLUS
    * delta-partition aggregate (orders on/after), re-merged by key: the
    * [[qIncrementalAgg]] pattern extended across a join. The oracle
    * computes the view from scratch on the full join; the hash match
    * PROVES incremental = full recompute. Both partitions pre-aggregate
    * BEFORE the merge, so the combine step is |nations|-sized; the date
    * split predicate pushes to the orders scan. Revenue in exact cents.
    */
  def qMvJoinDelta(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.t(spark, sfDir, "customer")
      .select("c_custkey", "c_nationkey")
    def view(orders: DataFrame): DataFrame =
      orders.join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_orders"),
          sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
            .as("rev_cents"))
    val cut = lit("2000-01-01").cast("timestamp")
    val base = view(Tables.t(spark, sfDir, "orders")
      .filter(col("o_orderdate") < cut))
    val delta = view(Tables.t(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= cut))
    base.unionAll(delta)
      .groupBy("c_nationkey")
      .agg(sum("n_orders").as("n_orders"),
        sum("rev_cents").as("rev_cents"))
      .orderBy("c_nationkey")
  }

  val qMvJoinDeltaSql: String =
    """SELECT c.c_nationkey, count(*) AS n_orders,
      |  CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |    AS rev_cents
      |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |GROUP BY c.c_nationkey ORDER BY c.c_nationkey""".stripMargin

  // ───────── SCD2 point-in-time lookup (round 7, wave 2) ─────────

  /** The AS-OF date every SCD2 table exists to serve. Mid-range of the
    * events window at every SF (data spans 2024-01). */
  private val PitTs = "2024-01-15 12:00:00"

  /** Point-in-time lookup against the [[qScd2]] dimension: each user's
    * state version active AT the fixed instant (valid_from ≤ t <
    * valid_to, open intervals NULL-bounded) — the query side of slowly-
    * changing-dimension modeling, completing build ([[qScd2]]) with
    * read. Scale: the interval build is the shared per-user window
    * chain; the PIT predicate filters to ≤1 row per user with no
    * further shuffle.
    */
  def qScd2Pit(spark: SparkSession, sfDir: String): DataFrame =
    scd2Intervals(spark, sfDir)
      .filter(col("valid_from") <= lit(PitTs).cast("timestamp") &&
        (col("valid_to") > lit(PitTs).cast("timestamp")
          || col("valid_to").isNull))
      .select("user_id", "state", "valid_from", "n_events")
      .orderBy("user_id")

  val qScd2PitSql: String =
    s"""WITH e AS (SELECT user_id, event_id, event_type,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
      |    CAST(ts AS TIMESTAMP) AS tss FROM events),
      |c AS (SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
      |      OR event_type <> lag(event_type) OVER w THEN 1 ELSE 0 END
      |    AS chg FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      |g AS (SELECT *, CAST(sum(chg) OVER (PARTITION BY user_id
      |    ORDER BY ts_us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND
      |    CURRENT ROW) AS BIGINT) AS grp FROM c),
      |iv AS (SELECT user_id, grp, event_type AS state,
      |    min(tss) AS valid_from, count(*) AS n_events
      |  FROM g GROUP BY user_id, grp, event_type),
      |v AS (SELECT *, lead(valid_from) OVER (PARTITION BY user_id
      |    ORDER BY grp) AS valid_to FROM iv)
      |SELECT user_id, state, valid_from, n_events FROM v
      |WHERE valid_from <= TIMESTAMP '$PitTs'
      |  AND (valid_to > TIMESTAMP '$PitTs' OR valid_to IS NULL)
      |ORDER BY user_id""".stripMargin

  // ───────── declarative data-quality rule audit (round 7, wave 4) ─────────

  /** Declarative data-quality rule audit over orders — the dbt-test /
    * Great-Expectations gate as one engine operator: five single-pass
    * rules (positivity, date range, enum domain, key uniqueness,
    * not-null) evaluate in ONE conditional aggregate over the fact
    * table, plus one referential rule (custkey → customer) as a left
    * join audit — per rule: rows checked, violations. Zero violations
    * on this feed is the expected steady state; the operator's value
    * is the gate itself. Scale: one scan + one broadcast-able FK join.
    */
  def qDqRules(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.t(spark, sfDir, "orders")
      .agg(count(lit(1)).as("n"),
        sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("r1"),
        sum(when(col("o_orderdate") < lit("1990-01-01").cast("timestamp")
          || col("o_orderdate") > lit("2030-01-01").cast("timestamp"), 1L)
          .otherwise(0L)).as("r2"),
        sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L)
          .otherwise(0L)).as("r3"),
        (count(lit(1)) - countDistinct("o_orderkey")).as("r4"),
        sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("r5"))
    val fk = Tables.t(spark, sfDir, "orders").select("o_custkey")
      .join(Tables.t(spark, sfDir, "customer").select("c_custkey"),
        col("o_custkey") === col("c_custkey"), "left")
      .agg(count(lit(1)).as("n"),
        sum(when(col("c_custkey").isNull, 1L).otherwise(0L)).as("v"))
    def rule(name: String, src: DataFrame, vcol: String): DataFrame =
      src.select(lit(name).as("rule"), col("n").as("n_checked"),
        col(vcol).as("n_violations"))
    rule("totalprice_positive", base, "r1")
      .unionAll(rule("orderdate_in_range", base, "r2"))
      .unionAll(rule("orderstatus_domain", base, "r3"))
      .unionAll(rule("orderkey_unique", base, "r4"))
      .unionAll(rule("custkey_not_null", base, "r5"))
      .unionAll(rule("custkey_fk_customer", fk, "v"))
      .orderBy("rule")
  }

  val qDqRulesSql: String =
    """WITH base AS (SELECT count(*) AS n,
      |    sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS r1,
      |    sum(CASE WHEN o_orderdate < TIMESTAMP '1990-01-01'
      |      OR o_orderdate > TIMESTAMP '2030-01-01' THEN 1 ELSE 0 END)
      |      AS r2,
      |    sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
      |      THEN 1 ELSE 0 END) AS r3,
      |    count(*) - count(DISTINCT o_orderkey) AS r4,
      |    sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS r5
      |  FROM orders),
      |fk AS (SELECT count(*) AS n,
      |    sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS v
      |  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey)
      |SELECT * FROM (
      |  SELECT 'totalprice_positive' AS rule, CAST(n AS BIGINT)
      |      AS n_checked, CAST(r1 AS BIGINT) AS n_violations FROM base
      |  UNION ALL SELECT 'orderdate_in_range', n, CAST(r2 AS BIGINT)
      |    FROM base
      |  UNION ALL SELECT 'orderstatus_domain', n, CAST(r3 AS BIGINT)
      |    FROM base
      |  UNION ALL SELECT 'orderkey_unique', n, CAST(r4 AS BIGINT)
      |    FROM base
      |  UNION ALL SELECT 'custkey_not_null', n, CAST(r5 AS BIGINT)
      |    FROM base
      |  UNION ALL SELECT 'custkey_fk_customer', CAST(n AS BIGINT),
      |    CAST(v AS BIGINT) FROM fk
      |) ORDER BY rule""".stripMargin

  // ───────────────── SCD type-3: current + previous state ─────────────────

  /** SCD type-3 readout from the shared [[scd2Intervals]] relation: per
    * user, the CURRENT state, the PREVIOUS state column (type-3 keeps
    * exactly one history column instead of type-2's full interval
    * table), when the current state began, and the total change count.
    * One rank window over the per-user interval relation (already
    * |changes|-sized, not event-sized).
    */
  def qScd3(spark: SparkSession, sfDir: String): DataFrame = {
    val byGrpDesc = Window.partitionBy("user_id").orderBy(desc("grp"))
    scd2Intervals(spark, sfDir)
      .withColumn("rn", row_number().over(byGrpDesc))
      .filter(col("rn") <= 2)
      .groupBy("user_id")
      .agg(max(when(col("rn") === 1, col("state"))).as("state"),
        max(when(col("rn") === 2, col("state"))).as("prev_state"),
        max(when(col("rn") === 1, col("valid_from"))).as("changed_at"),
        max("grp").as("n_intervals"))
      .orderBy("user_id")
  }

  val qScd3Sql: String =
    """WITH e AS (SELECT user_id, event_id, event_type,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
      |    CAST(ts AS TIMESTAMP) AS tss FROM events),
      |c AS (SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
      |      OR event_type <> lag(event_type) OVER w THEN 1 ELSE 0 END
      |    AS chg FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      |g AS (SELECT *, CAST(sum(chg) OVER (PARTITION BY user_id
      |    ORDER BY ts_us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND
      |    CURRENT ROW) AS BIGINT) AS grp FROM c),
      |iv AS (SELECT user_id, grp, event_type AS state,
      |    min(tss) AS valid_from FROM g GROUP BY user_id, grp, event_type),
      |r AS (SELECT *, row_number() OVER (PARTITION BY user_id
      |    ORDER BY grp DESC) AS rn FROM iv)
      |SELECT user_id,
      |  max(CASE WHEN rn = 1 THEN state END) AS state,
      |  max(CASE WHEN rn = 2 THEN state END) AS prev_state,
      |  max(CASE WHEN rn = 1 THEN valid_from END) AS changed_at,
      |  max(grp) AS n_intervals
      |FROM r WHERE rn <= 2 GROUP BY user_id ORDER BY user_id""".stripMargin

  // ───────── bitemporal as-of reconstruction (round 9) ─────────

  /** Bitemporal as-of query over a two-axis versioned order table —
    * "what did we BELIEVE (transaction time T) the orders effective at
    * VALID time V to be?", the audit/restatement capability SCD2's
    * single axis cannot express. Versions are synthesized
    * deterministically: v1 recorded at the order date and valid from
    * it; every 5th order gains a RETROACTIVE correction (+1000 cents,
    * valid from order date, i.e. restating history) recorded 30 days
    * later — so moving T across the recording date changes what V sees.
    * Four (T, V) probes (day offsets from the global min order date,
    * broadcast 1-row scalar) fan out IN-ROW (the bootstrap convention);
    * per (probe, order) the applicable version is the max (vt, tx)
    * among versions with tx ≤ T and vt ≤ V — a fact-keyed window over
    * ≤ 2×4 rows per order. All time math in exact epoch-µs integers;
    * totals in exact cents.
    */
  def qBitemporal(spark: SparkSession, sfDir: String): DataFrame = {
    val day = 86400000000L
    val o = Tables.t(spark, sfDir, "orders")
      .select(col("o_orderkey").as("k"),
        expr("unix_micros(o_orderdate)").as("od"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    val v1 = o.select(col("k"), col("od").as("vt"), col("od").as("tx"),
      col("cents"))
    val v2 = o.filter(col("k") % 5 === 0)
      .select(col("k"), col("od").as("vt"),
        (col("od") + lit(30L * day)).as("tx"),
        (col("cents") + 1000L).as("cents"))
    val versions = v1.unionByName(v2)
    val gmin = o.agg(min("od").as("g0"))
    val probes = versions.crossJoin(broadcast(gmin))
      .select(col("k"), col("vt"), col("tx"), col("cents"),
        explode(expr(
          """array(named_struct('t_off', 200L, 'v_off', 400L),
            |      named_struct('t_off', 200L, 'v_off', 100L),
            |      named_struct('t_off', 600L, 'v_off', 400L),
            |      named_struct('t_off', 600L, 'v_off', 100L))"""
            .stripMargin)).as("p"),
        col("g0"))
      .select(col("k"), col("vt"), col("tx"), col("cents"),
        col("p.t_off").as("t_off"), col("p.v_off").as("v_off"),
        (col("g0") + col("p.t_off") * day).as("bigT"),
        (col("g0") + col("p.v_off") * day).as("bigV"))
      .filter(col("tx") <= col("bigT") && col("vt") <= col("bigV"))
    val w = Window.partitionBy("t_off", "v_off", "k")
      .orderBy(col("vt").desc, col("tx").desc)
    probes.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy("t_off", "v_off")
      .agg(count(lit(1)).as("n_orders"), sum("cents").as("cents_total"))
      .orderBy("t_off", "v_off")
  }

  val qBitemporalSql: String =
    """WITH o AS (SELECT o_orderkey AS k,
      |    epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS od,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders),
      |versions AS (
      |  SELECT k, od AS vt, od AS tx, cents FROM o
      |  UNION ALL
      |  SELECT k, od AS vt, od + 30 * 86400000000 AS tx,
      |    cents + 1000 AS cents
      |  FROM o WHERE k % 5 = 0),
      |g AS (SELECT min(od) AS g0 FROM o),
      |pr AS (SELECT * FROM (VALUES (200, 400), (200, 100),
      |    (600, 400), (600, 100)) p(t_off, v_off)),
      |cand AS (SELECT v.k, v.vt, v.tx, v.cents, pr.t_off, pr.v_off
      |  FROM versions v, pr, g
      |  WHERE v.tx <= g.g0 + pr.t_off * CAST(86400000000 AS BIGINT)
      |    AND v.vt <= g.g0 + pr.v_off * CAST(86400000000 AS BIGINT)),
      |r AS (SELECT *, row_number() OVER (
      |    PARTITION BY t_off, v_off, k ORDER BY vt DESC, tx DESC) AS rn
      |  FROM cand)
      |SELECT CAST(t_off AS BIGINT) AS t_off, CAST(v_off AS BIGINT) AS v_off,
      |  count(*) AS n_orders, CAST(sum(cents) AS BIGINT) AS cents_total
      |FROM r WHERE rn = 1 GROUP BY t_off, v_off
      |ORDER BY t_off, v_off""".stripMargin
}

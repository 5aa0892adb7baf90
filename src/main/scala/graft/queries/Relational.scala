package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Relational core: scans, filters, joins, aggregation, windows, sort/limit,
  * set ops, subqueries (SURVEY.md §2.1–2.7, §2.11).
  *
  * Conventions (SURVEY.md §2 rules A–H): every oracle query ends in a total
  * ORDER BY with explicit null ordering, every computed double is
  * round(_, 4), timestamps stay µs, session timezone is UTC.
  */
object Relational {

  // ───────────────────────────── §2.1 scans ─────────────────────────────

  def qScanProject(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber")

  val qScanProjectSql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin

  def qScanFilter(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") <= lit("1996-06-30").cast("timestamp"))
      .select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber")

  val qScanFilterSql: String =
    """SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1996-06-30'
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  private val allTables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "documents", "embeddings")

  def qScanCount(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = allTables.map { name =>
      t(spark, sfDir, name).agg(lit(name).as("tbl"), count(lit(1)).as("cnt"))
    } :+ graft.Tables.events(spark, sfDir)
      .agg(lit("events").as("tbl"), count(lit(1)).as("cnt"))
    counts.reduce(_.unionAll(_)).orderBy("tbl")
  }

  val qScanCountSql: String =
    (allTables :+ "events").sorted
      .map(n => s"SELECT '$n' AS tbl, count(*) AS cnt FROM $n")
      .mkString("", " UNION ALL ", " ORDER BY tbl")

  /** Parquet write→read roundtrip (oracle=unit; rows-only check). */
  def qSinkRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = graft.TmpDirs.create("graft_roundtrip")
    val src = t(spark, sfDir, "nation")
    src.write.mode("overwrite").parquet(s"$dir/nation")
    spark.read.parquet(s"$dir/nation")
      .agg(count(lit(1)).as("cnt"), sum("n_nationkey").as("key_sum"))
  }

  // ─────────────────────── §2.2 filters / predicates ────────────────────

  def qFilterComplex(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "part")
      .filter(
        (col("p_brand").isin("Brand#1", "Brand#13", "Brand#25") &&
          col("p_size").between(5, 30) &&
          !col("p_type").like("ECONOMY%")) ||
          (col("p_name").like("red%") && col("p_retailprice") > 950.0))
      .filter(col("p_name").isNotNull)
      .select("p_partkey", "p_name", "p_brand", "p_type", "p_size")
      .orderBy("p_partkey")

  val qFilterComplexSql: String =
    """SELECT p_partkey, p_name, p_brand, p_type, p_size FROM part
      |WHERE ((p_brand IN ('Brand#1','Brand#13','Brand#25')
      |        AND p_size BETWEEN 5 AND 30
      |        AND NOT p_type LIKE 'ECONOMY%')
      |   OR (p_name LIKE 'red%' AND p_retailprice > 950.0))
      |  AND p_name IS NOT NULL
      |ORDER BY p_partkey""".stripMargin

  def qCaseNull(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "customer")
      .select(
        col("c_custkey"),
        when(col("c_acctbal") < 0, "debt")
          .when(col("c_acctbal") < 5000, "mid")
          .otherwise("rich").as("band"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")),
          lit("(building)")).as("seg"),
        (col("c_mktsegment") <=> lit("MACHINERY")).as("is_machinery"))
      .orderBy("c_custkey")

  val qCaseNullSql: String =
    """SELECT c_custkey,
      |  CASE WHEN c_acctbal < 0 THEN 'debt'
      |       WHEN c_acctbal < 5000 THEN 'mid' ELSE 'rich' END AS band,
      |  coalesce(nullif(c_mktsegment, 'BUILDING'), '(building)') AS seg,
      |  c_mktsegment IS NOT DISTINCT FROM 'MACHINERY' AS is_machinery
      |FROM customer ORDER BY c_custkey""".stripMargin

  // ───────────────────────────── §2.3 joins ─────────────────────────────

  def qJoinInner(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = t(spark, sfDir, "orders")
    val cust = t(spark, sfDir, "customer")
    orders
      .join(cust, orders("o_custkey") === cust("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 4).as("revenue"))
      .orderBy("c_mktsegment")
  }

  val qJoinInnerSql: String =
    """SELECT c_mktsegment, count(*) AS n_orders,
      |  round(sum(o_totalprice), 4) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Dim tables are tiny at any SF → explicit broadcast keeps this a
    * shuffle-free BroadcastHashJoin chain at 100 TB too. */
  def qJoinBroadcast(spark: SparkSession, sfDir: String): DataFrame = {
    val sup = t(spark, sfDir, "supplier")
    val nat = broadcast(t(spark, sfDir, "nation"))
    val reg = broadcast(t(spark, sfDir, "region"))
    sup
      .join(nat, sup("s_nationkey") === nat("n_nationkey"))
      .join(reg, nat("n_regionkey") === reg("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(count(lit(1)).as("n_suppliers"),
        round(sum("s_acctbal"), 4).as("bal"))
      .orderBy("r_name", "n_name")
  }

  val qJoinBroadcastSql: String =
    """SELECT r_name, n_name, count(*) AS n_suppliers,
      |  round(sum(s_acctbal), 4) AS bal
      |FROM supplier
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin

  def qJoinLeft(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = t(spark, sfDir, "customer")
    val orders = t(spark, sfDir, "orders")
      .filter(col("o_totalprice") > 400000.0)
    cust
      .join(orders, cust("c_custkey") === orders("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("n_big_orders"))
      .orderBy("c_custkey")
  }

  val qJoinLeftSql: String =
    """SELECT c_custkey, count(o_orderkey) AS n_big_orders
      |FROM customer LEFT JOIN
      |  (SELECT * FROM orders WHERE o_totalprice > 400000.0) o
      |  ON c_custkey = o_custkey
      |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin

  def qJoinFull(spark: SparkSession, sfDir: String): DataFrame = {
    val lowCust = t(spark, sfDir, "customer")
      .filter(col("c_custkey") < 100).select("c_custkey", "c_name")
    val bigOrders = t(spark, sfDir, "orders")
      .filter(col("o_totalprice") > 450000.0)
      .select("o_custkey", "o_orderkey", "o_totalprice")
    lowCust
      .join(bigOrders, lowCust("c_custkey") === bigOrders("o_custkey"), "full")
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        round(col("o_totalprice"), 4).as("price"))
      .orderBy(asc_nulls_first("c_custkey"), asc_nulls_first("o_orderkey"))
  }

  val qJoinFullSql: String =
    """SELECT c_custkey, c_name, o_orderkey,
      |  round(o_totalprice, 4) AS price
      |FROM (SELECT c_custkey, c_name FROM customer WHERE c_custkey < 100) c
      |FULL JOIN (SELECT o_custkey, o_orderkey, o_totalprice FROM orders
      |           WHERE o_totalprice > 450000.0) o
      |  ON c.c_custkey = o.o_custkey
      |ORDER BY c_custkey ASC NULLS FIRST, o_orderkey ASC NULLS FIRST""".stripMargin

  def qJoinSemi(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = t(spark, sfDir, "customer")
    val urgent = t(spark, sfDir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    cust
      .join(urgent, cust("c_custkey") === urgent("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  val qJoinSemiSql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
      |              AND o.o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin

  /** NOT-EXISTS anti join. Restricted to 'P'-status orders so the result
    * is non-empty at every scale factor (every customer has SOME order in
    * this data — the unrestricted variant degenerates to an empty, and
    * therefore evidence-free, oracle).
    */
  def qJoinAnti(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = t(spark, sfDir, "customer")
    val openOrders = t(spark, sfDir, "orders")
      .filter(col("o_orderstatus") === "P")
    cust
      .join(openOrders, cust("c_custkey") === openOrders("o_custkey"),
        "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  val qJoinAntiSql: String =
    """SELECT c_custkey, c_name FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                  AND o.o_orderstatus = 'P')
      |ORDER BY c_custkey""".stripMargin

  /** Non-equi band join: price bands × lineitem. The band table is a tiny
    * literal dim → broadcast nested-loop, the only sane physical plan. */
  def qJoinTheta(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val bands = Seq(("low", 0.0, 20000.0), ("mid", 20000.0, 60000.0),
      ("high", 60000.0, 1e9)).toDF("band", "lo", "hi")
    val li = t(spark, sfDir, "lineitem")
    li.join(broadcast(bands),
        li("l_extendedprice") >= bands("lo") &&
          li("l_extendedprice") < bands("hi"))
      .groupBy("band")
      .agg(count(lit(1)).as("n"),
        round(sum("l_extendedprice"), 4).as("total"))
      .orderBy("band")
  }

  val qJoinThetaSql: String =
    """SELECT band, count(*) AS n, round(sum(l_extendedprice), 4) AS total
      |FROM lineitem JOIN (VALUES ('low', 0.0, 20000.0),
      |  ('mid', 20000.0, 60000.0), ('high', 60000.0, 1e9)) b(band, lo, hi)
      |  ON l_extendedprice >= lo AND l_extendedprice < hi
      |GROUP BY band ORDER BY band""".stripMargin

  def qJoinCross(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "region")
      .crossJoin(t(spark, sfDir, "nation"))
      .select("r_name", "n_name")
      .orderBy("r_name", "n_name")

  val qJoinCrossSql: String =
    """SELECT r_name, n_name FROM region CROSS JOIN nation
      |ORDER BY r_name, n_name""".stripMargin

  /** As-of join, scalably: the right side collapses to DISTINCT order
    * dates — bounded by calendar days (~2.4k) at ANY scale factor — which
    * ride the plan as a sorted array; each event binary-searches its
    * floor via the codegen'd [[graft.functions.SortedFloorLong]]
    * expression (round 12 — retires the last per-row Scala UDF in the
    * relational family: the whole probe now stays inside whole-stage
    * codegen with no boxing). Zero shuffle on the fact side (vs. a
    * broadcast-nested-loop interval join, which is O(|events|·|dates|)
    * and 70× slower at sf0.1).
    */
  def qJoinAsof(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = graft.Tables.events(spark, sfDir)
    // o_orderdate arrives as TIMESTAMP_NTZ (parquet ms, not UTC-adjusted);
    // collect epoch millis (session tz = UTC) rather than JVM time objects.
    val dates: Array[Long] = t(spark, sfDir, "orders")
      .select(unix_millis(col("o_orderdate").cast("timestamp")))
      .distinct().collect().map(_.getLong(0)).sorted
    ev.select(col("event_id"),
        timestamp_millis(
          graft.functions.SortedFloorLong.col(unix_millis(col("ts")), dates))
          .as("asof_date"))
      .orderBy("event_id")
  }

  val qJoinAsofSql: String =
    """SELECT event_id,
      |  (SELECT max(o_orderdate) FROM orders
      |   WHERE o_orderdate <= CAST(e.ts AS TIMESTAMP)) AS asof_date
      |FROM events e ORDER BY event_id""".stripMargin

  /** KEYED as-of join on the custom `AsofJoinExec` operator
    * (graft/plans/AsofJoin.scala — logical node + strategy + physical
    * two-pointer merge): every click looks up the same user's latest
    * prior purchase, point-in-time-correct. One shuffle + sort per side
    * (a sort-merge join's envelope), O(1) merge state per partition —
    * the fully distributed form of q_join_asof's keyless broadcast
    * binary search. The right side pre-aggregates to one row per
    * (user, ts) so asof tie-breaking is deterministic. Oracle: DuckDB's
    * native ASOF LEFT JOIN — two independent implementations of the
    * operator, one answer.
    */
  def qJoinAsofExec(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = graft.Tables.events(spark, sfDir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts").as("cts"))
    val purch = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id").as("puser"), col("ts").as("pts"))
      .agg(max("event_id").as("pid"))
    val j = graft.plans.AsofOps.join(clicks, purch,
      clicks("user_id"), purch("puser"), clicks("cts"), purch("pts"))
    j.groupBy("user_id")
      .agg(count(lit(1)).as("n_clicks"),
        count(col("pid")).as("n_attributed"),
        max(expr("(unix_micros(cts) - unix_micros(pts)) div 1000000"))
          .as("max_gap_s"))
      .orderBy("user_id")
  }

  val qJoinAsofExecSql: String =
    """WITH clicks AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS cts
      |  FROM events WHERE event_type = 'click'),
      |purch AS (SELECT user_id AS puser, CAST(ts AS TIMESTAMP) AS pts,
      |    max(event_id) AS pid
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
      |SELECT c.user_id, count(*) AS n_clicks, count(p.pid) AS n_attributed,
      |  CAST(max((epoch_us(c.cts) - epoch_us(p.pts)) // 1000000) AS BIGINT)
      |    AS max_gap_s
      |FROM clicks c ASOF LEFT JOIN purch p
      |  ON c.user_id = p.puser AND p.pts <= c.cts
      |GROUP BY c.user_id ORDER BY c.user_id""".stripMargin

  /** FORWARD keyed as-of join — every click looks up the same user's
    * EARLIEST subsequent purchase (time-to-conversion, the mirror of
    * [[qJoinAsofExec]]'s latest-prior attribution) — implemented by
    * COMPOSING the existing backward [[graft.plans.AsofJoinExec]] under
    * time negation: the latest −pts ≤ −cts is exactly the earliest
    * pts ≥ cts, so the custom operator needs no direction flag and both
    * directions share one physical implementation (same one-shuffle +
    * O(1)-state two-pointer merge). Oracle: DuckDB's native forward
    * ASOF (`p.pts >= c.cts`) — two independent engines, one answer.
    */
  def qJoinAsofFwd(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = graft.Tables.events(spark, sfDir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("cts_us"))
      .withColumn("nct", -col("cts_us"))
    val purch = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id").as("puser"),
        unix_micros(col("ts")).as("pts_us"))
      .agg(max("event_id").as("pid"))
      .withColumn("npt", -col("pts_us"))
    val j = graft.plans.AsofOps.join(clicks, purch,
      clicks("user_id"), purch("puser"), clicks("nct"), purch("npt"))
    j.groupBy("user_id")
      .agg(count(lit(1)).as("n_clicks"),
        count(col("pid")).as("n_next"),
        max(expr("(pts_us - cts_us) div 1000000")).as("max_wait_s"))
      .orderBy("user_id")
  }

  val qJoinAsofFwdSql: String =
    """WITH clicks AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP)
      |    AS cts FROM events WHERE event_type = 'click'),
      |purch AS (SELECT user_id AS puser, CAST(ts AS TIMESTAMP) AS pts,
      |    max(event_id) AS pid
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
      |SELECT c.user_id, count(*) AS n_clicks, count(p.pid) AS n_next,
      |  CAST(max((epoch_us(p.pts) - epoch_us(c.cts)) // 1000000)
      |    AS BIGINT) AS max_wait_s
      |FROM clicks c ASOF LEFT JOIN purch p
      |  ON c.user_id = p.puser AND p.pts >= c.cts
      |GROUP BY c.user_id ORDER BY c.user_id""".stripMargin

  /** TPC-H Q5-shaped 5-way star join. Dims broadcast; the two fact tables
    * meet in one shuffle on orderkey. */
  def qJoinMultiway(spark: SparkSession, sfDir: String): DataFrame = {
    val li = t(spark, sfDir, "lineitem")
    val od = t(spark, sfDir, "orders")
    val cu = t(spark, sfDir, "customer")
    val na = broadcast(t(spark, sfDir, "nation"))
    val re = broadcast(t(spark, sfDir, "region"))
    li.join(od, li("l_orderkey") === od("o_orderkey"))
      .join(cu, od("o_custkey") === cu("c_custkey"))
      .join(na, cu("c_nationkey") === na("n_nationkey"))
      .join(re, na("n_regionkey") === re("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name", "n_name")
  }

  val qJoinMultiwaySql: String =
    """SELECT r_name, n_name,
      |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin

  // ─────────────────────────── §2.4 aggregation ─────────────────────────

  /** TPC-H Q1 shape — partial+final HashAggregate, no shuffle of raw rows. */
  def qAggBasic(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 4).as("sum_qty"),
        round(sum("l_extendedprice"), 4).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) *
          (lit(1) + col("l_tax"))), 4).as("sum_charge"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_extendedprice"), 4).as("avg_price"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val qAggBasicSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 4) AS sum_qty,
      |  round(sum(l_extendedprice), 4) AS sum_base_price,
      |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
      |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4)
      |    AS sum_charge,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  round(avg(l_extendedprice), 4) AS avg_price,
      |  round(avg(l_discount), 4) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  def qAggDistinct(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .groupBy("o_orderpriority")
      .agg(countDistinct("o_custkey").as("n_customers"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")

  val qAggDistinctSql: String =
    """SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_customers,
      |  count(*) AS n_orders
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  def qAggHaving(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 4).as("total"))
      .filter(col("n_orders") >= 12)
      .orderBy("o_custkey")

  val qAggHavingSql: String =
    """SELECT o_custkey, count(*) AS n_orders,
      |  round(sum(o_totalprice), 4) AS total
      |FROM orders GROUP BY o_custkey HAVING count(*) >= 12
      |ORDER BY o_custkey""".stripMargin

  def qAggStats(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        round(stddev_samp("l_quantity"), 4).as("sd_qty"),
        round(var_samp("l_extendedprice"), 4).as("var_price"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4)
          .as("covar_qp"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 4)
          .as("corr_qp"))
      .orderBy("l_returnflag")

  val qAggStatsSql: String =
    """SELECT l_returnflag,
      |  round(stddev_samp(l_quantity), 4) AS sd_qty,
      |  round(var_samp(l_extendedprice), 4) AS var_price,
      |  round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qp,
      |  round(corr(l_quantity, l_extendedprice), 4) AS corr_qp
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  def qAggPercentile(spark: SparkSession, sfDir: String): DataFrame =
    graft.Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(
        round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.9)"), 4).as("p90"),
        count(lit(1)).as("n"))
      .orderBy("event_type")

  val qAggPercentileSql: String =
    """SELECT event_type,
      |  round(percentile_cont(0.5) WITHIN GROUP (ORDER BY value), 4) AS p50,
      |  round(percentile_cont(0.9) WITHIN GROUP (ORDER BY value), 4) AS p90,
      |  count(*) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  def qAggRollup(spark: SparkSession, sfDir: String): DataFrame = {
    // DataFrame rollup over join output trips the ambiguous-self-join
    // check in Spark 4.1; the SQL form resolves cleanly and produces the
    // same plan (broadcast dims + two-phase expand/aggregate).
    t(spark, sfDir, "customer").createOrReplaceTempView("customer")
    t(spark, sfDir, "nation").createOrReplaceTempView("nation")
    t(spark, sfDir, "region").createOrReplaceTempView("region")
    spark.sql(qAggRollupSql)
  }

  val qAggRollupSql: String =
    """SELECT r_name, n_name, count(*) AS n_cust,
      |  round(sum(c_acctbal), 4) AS bal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name)
      |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin

  def qAggCube(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "documents")
      .cube("lang", "source")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("chars"))
      .orderBy(asc_nulls_first("lang"), asc_nulls_first("source"))

  // CAST: DuckDB sum(BIGINT) yields HUGEINT, which pandas reads as float64
  // and hash-mismatches Spark's int64 (same hazard as qFnJsonSql/qDocStatsSql).
  val qAggCubeSql: String =
    """SELECT lang, source, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS chars
      |FROM documents GROUP BY CUBE (lang, source)
      |ORDER BY lang ASC NULLS FIRST, source ASC NULLS FIRST""".stripMargin

  def qAggGsets(spark: SparkSession, sfDir: String): DataFrame = {
    t(spark, sfDir, "documents").createOrReplaceTempView("documents")
    spark.sql(
      """SELECT lang, source, count(*) AS n_docs,
        |  CAST(grouping(lang) AS BIGINT) AS g_lang,
        |  CAST(grouping(source) AS BIGINT) AS g_source
        |FROM documents GROUP BY GROUPING SETS ((lang), (source), ())
        |ORDER BY lang ASC NULLS FIRST, source ASC NULLS FIRST""".stripMargin)
  }

  val qAggGsetsSql: String =
    """SELECT lang, source, count(*) AS n_docs,
      |  CAST(grouping(lang) AS BIGINT) AS g_lang,
      |  CAST(grouping(source) AS BIGINT) AS g_source
      |FROM documents GROUP BY GROUPING SETS ((lang), (source), ())
      |ORDER BY lang ASC NULLS FIRST, source ASC NULLS FIRST""".stripMargin

  /** HLL estimates differ across engines (SURVEY §2 rule H) → unit-checked
    * against exact counts with ±5% tolerance; no SQL oracle. */
  def qAggHll(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .groupBy("o_orderpriority")
      .agg(approx_count_distinct("o_custkey").as("approx_customers"))
      .orderBy("o_orderpriority")

  // ──────────────────────────── §2.5 windows ────────────────────────────

  import org.apache.spark.sql.expressions.Window

  def qWinRank(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("l_suppkey")
      .orderBy(desc("l_extendedprice"), asc("l_orderkey"), asc("l_linenumber"))
    t(spark, sfDir, "lineitem")
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"),
        row_number().over(w).cast("long").as("rn"),
        rank().over(w).cast("long").as("rk"),
        dense_rank().over(w).cast("long").as("drk"))
      .filter(col("rn") <= 5)
      .orderBy("l_suppkey", "rn")
  }

  val qWinRankSql: String =
    """SELECT * FROM (
      |  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
      |    row_number() OVER w AS rn, rank() OVER w AS rk,
      |    dense_rank() OVER w AS drk
      |  FROM lineitem
      |  WINDOW w AS (PARTITION BY l_suppkey
      |    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber)
      |) WHERE rn <= 5 ORDER BY l_suppkey, rn""".stripMargin

  def qWinRunning(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(spark, sfDir, "orders")
      .filter(col("o_custkey") < 50)
      // No running round(avg): avg of 2-decimal prices over tiny counts
      // lands exactly on the round(4) half-way grid (e.g. x.xx/8 =
      // ….01375) and Spark/DuckDB doubles straddle the boundary.
      .select(col("o_custkey"), col("o_orderkey"),
        round(sum("o_totalprice").over(w), 4).as("run_sum"),
        count(lit(1)).over(w).as("run_cnt"),
        round(min("o_totalprice").over(w), 4).as("run_min"))
      .orderBy("o_custkey", "o_orderkey")
  }

  val qWinRunningSql: String =
    """SELECT o_custkey, o_orderkey,
      |  round(sum(o_totalprice) OVER w, 4) AS run_sum,
      |  count(*) OVER w AS run_cnt,
      |  round(min(o_totalprice) OVER w, 4) AS run_min
      |FROM orders WHERE o_custkey < 50
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  def qWinLagLead(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"),
        round(col("value"), 4).as("value"),
        round(lag("value", 1, 0.0).over(w), 4).as("prev_value"),
        round(lead("value", 1, 0.0).over(w), 4).as("next_value"))
      .orderBy("user_id", "event_id")
  }

  val qWinLagLeadSql: String =
    """SELECT user_id, event_id, round(value, 4) AS value,
      |  round(lag(value, 1, 0.0) OVER w, 4) AS prev_value,
      |  round(lead(value, 1, 0.0) OVER w, 4) AS next_value
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, event_id""".stripMargin

  /** Global ntile/percent_rank/cume_dist WITHOUT a global window (which
    * funnels the whole table through one partition — the q_shard_pack
    * scale lesson). Range-bucket on the sort key → per-bucket counts →
    * prefix offsets over the ≤P-row bucket table → broadcast back →
    * partitioned row_number + offset = the exact global rank. The order
    * key (c_acctbal, c_custkey) is unique, so percent_rank = (rn−1)/(n−1)
    * and cume_dist = rn/n; ntile(4) is closed-form from (rn, n). Output
    * is bit-identical to the single-window formulation the oracle runs.
    */
  def qWinNtilePct(spark: SparkSession, sfDir: String): DataFrame = {
    val P = 32
    val cust = t(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_acctbal"))
    val stats = cust.agg(min("c_acctbal").as("lo"),
      max("c_acctbal").as("hi"), count(lit(1)).as("n"))
    val withPid = cust.crossJoin(broadcast(stats))
      .withColumn("pid", least(lit(P - 1),
        floor((col("c_acctbal") - col("lo")) * P /
          (col("hi") - col("lo") + lit(1e-9))).cast("int")))
    // bucket offsets: ≤ P rows — a driver-sized frame, not data-sized
    val wOff = Window.orderBy("pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withPid.groupBy("pid").agg(count(lit(1)).as("pc"))
      .withColumn("off", coalesce(sum("pc").over(wOff), lit(0L)))
      .select("pid", "off")
    val wIn = Window.partitionBy("pid").orderBy("c_acctbal", "c_custkey")
    withPid.join(broadcast(offsets), "pid")
      .withColumn("rn", col("off") + row_number().over(wIn))
      .withColumn("q4", expr("n div 4"))
      .withColumn("r4", col("n") % 4)
      .select(col("c_custkey"), round(col("c_acctbal"), 4).as("bal"),
        expr("""CAST(CASE WHEN rn <= r4 * (q4 + 1)
                  THEN (rn - 1) div (q4 + 1) + 1
                  ELSE r4 + (rn - r4 * (q4 + 1) - 1) div q4 + 1
                END AS BIGINT)""").as("quartile"),
        round((col("rn") - 1).cast("double") / (col("n") - 1), 4)
          .as("pct_rank"),
        round(col("rn").cast("double") / col("n"), 4).as("cume"))
      .orderBy("c_custkey")
  }

  val qWinNtilePctSql: String =
    """SELECT c_custkey, round(c_acctbal, 4) AS bal,
      |  ntile(4) OVER w AS quartile,
      |  round(percent_rank() OVER w, 4) AS pct_rank,
      |  round(cume_dist() OVER w, 4) AS cume
      |FROM customer
      |WINDOW w AS (ORDER BY c_acctbal, c_custkey)
      |ORDER BY c_custkey""".stripMargin

  def qWinRangeFrame(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal")
      .rangeBetween(-100, 0)
    t(spark, sfDir, "customer")
      .select(col("c_mktsegment"), col("c_custkey"),
        round(col("c_acctbal"), 4).as("bal"),
        count(lit(1)).over(w).as("peers_within_100"))
      .orderBy("c_mktsegment", "c_custkey")
  }

  val qWinRangeFrameSql: String =
    """SELECT c_mktsegment, c_custkey, round(c_acctbal, 4) AS bal,
      |  count(*) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal
      |    RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) AS peers_within_100
      |FROM customer ORDER BY c_mktsegment, c_custkey""".stripMargin

  /** Sliding 1h event-time window via RANGE frame over epoch seconds. */
  def qWinTimeRange(spark: SparkSession, sfDir: String): DataFrame = {
    // MICROsecond range frame: second-truncated ordering would make
    // same-truncated-second events frame peers in Spark but not in the
    // oracle's µs-precision RANGE INTERVAL frame
    val ev = graft.Tables.events(spark, sfDir)
      .withColumn("ts_us", unix_micros(col("ts")))
    val w = Window.partitionBy("user_id").orderBy("ts_us")
      .rangeBetween(-3600L * 1000000L, 0)
    ev.select(col("user_id"), col("event_id"),
        round(sum("value").over(w), 4).as("sum_1h"),
        count(lit(1)).over(w).as("n_1h"))
      .orderBy("user_id", "event_id")
  }

  val qWinTimeRangeSql: String =
    """SELECT user_id, event_id,
      |  round(sum(value) OVER w, 4) AS sum_1h,
      |  count(*) OVER w AS n_1h
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)
      |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, event_id""".stripMargin

  // ──────────────────────── §2.6 sort / limit / topk ────────────────────

  def qSortMulti(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
      .orderBy(asc_nulls_first("o_orderstatus"), desc("o_totalprice"),
        asc("o_orderkey"))

  val qSortMultiSql: String =
    """SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
      |FROM orders
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_totalprice DESC,
      |  o_orderkey ASC""".stripMargin

  /** Global top-k → TakeOrderedAndProject (no global sort at scale). */
  def qTopk(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(25)

  val qTopkSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25""".stripMargin

  def qTopkPerGroup(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("l_suppkey")
      .orderBy(desc("l_extendedprice"), asc("l_orderkey"), asc("l_linenumber"))
    t(spark, sfDir, "lineitem")
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select("l_suppkey", "rn", "l_orderkey", "l_linenumber",
        "l_extendedprice")
      .orderBy("l_suppkey", "rn")
  }

  val qTopkPerGroupSql: String =
    """SELECT l_suppkey, rn, l_orderkey, l_linenumber, l_extendedprice
      |FROM (SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
      |        row_number() OVER (PARTITION BY l_suppkey
      |          ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
      |      FROM lineitem)
      |WHERE rn <= 3 ORDER BY l_suppkey, rn""".stripMargin

  /** Same result as [[qTopkPerGroup]] via the heap aggregate
    * ([[graft.functions.TopKRows]]): map-side k-bounded heaps merge as
    * partials, so the shuffle carries ≤ k rows per (group, map task)
    * instead of the whole fact table through a window sort — the 100 TB
    * shape. Shares the window oracle (identical rows by construction).
    */
  def qTopkHeap(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.graft.Shim
    val top = Shim.column(graft.functions.TopKRows(
      Shim.expression(col("l_extendedprice")),
      Shim.expression(col("l_orderkey")),
      Shim.expression(col("l_linenumber")), 3).toAggregateExpression())
    t(spark, sfDir, "lineitem")
      .groupBy("l_suppkey")
      .agg(top.as("top"))
      .select(col("l_suppkey"), posexplode(col("top")))
      .select(col("l_suppkey"), (col("pos") + 1).cast("long").as("rn"),
        col("col.key1").as("l_orderkey"), col("col.key2").as("l_linenumber"),
        col("col.score").as("l_extendedprice"))
      .orderBy("l_suppkey", "rn")
  }

  // ───────────────────────────── §2.7 set ops ───────────────────────────

  private def segKeys(spark: SparkSession, sfDir: String, seg: String) =
    t(spark, sfDir, "customer")
      .filter(col("c_mktsegment") === seg)
      .select("c_custkey")

  def qUnionAll(spark: SparkSession, sfDir: String): DataFrame =
    segKeys(spark, sfDir, "BUILDING")
      .unionAll(segKeys(spark, sfDir, "MACHINERY"))
      .orderBy("c_custkey")

  val qUnionAllSql: String =
    """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |UNION ALL
      |SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
      |ORDER BY c_custkey""".stripMargin

  def qUnionDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    val loyal = t(spark, sfDir, "orders").filter(col("o_totalprice") > 400000.0)
      .select(col("o_custkey").as("c_custkey"))
    segKeys(spark, sfDir, "BUILDING").union(loyal).distinct()
      .orderBy("c_custkey")
  }

  val qUnionDistinctSql: String =
    """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |UNION
      |SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 400000.0
      |ORDER BY c_custkey""".stripMargin

  private def orderCustkeys(spark: SparkSession, sfDir: String, prio: String) =
    t(spark, sfDir, "orders")
      .filter(col("o_orderpriority") === prio)
      .select(col("o_custkey"))

  def qIntersect(spark: SparkSession, sfDir: String): DataFrame =
    orderCustkeys(spark, sfDir, "1-URGENT")
      .intersect(orderCustkeys(spark, sfDir, "5-LOW"))
      .orderBy("o_custkey")

  val qIntersectSql: String =
    """SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
      |ORDER BY o_custkey""".stripMargin

  def qExcept(spark: SparkSession, sfDir: String): DataFrame =
    orderCustkeys(spark, sfDir, "1-URGENT")
      .except(orderCustkeys(spark, sfDir, "5-LOW"))
      .orderBy("o_custkey")

  val qExceptSql: String =
    """SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |EXCEPT
      |SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
      |ORDER BY o_custkey""".stripMargin

  /** Bag-semantics intersect: each custkey kept min(m, n) times. A bare
    * multiset result has no unique sort key, so aggregate to (key,
    * multiplicity) for the deterministic output (rule A). */
  def qIntersectAll(spark: SparkSession, sfDir: String): DataFrame =
    orderCustkeys(spark, sfDir, "1-URGENT")
      .intersectAll(orderCustkeys(spark, sfDir, "2-HIGH"))
      .groupBy("o_custkey").agg(count(lit(1)).as("multiplicity"))
      .orderBy("o_custkey")

  val qIntersectAllSql: String =
    """SELECT o_custkey, count(*) AS multiplicity FROM (
      |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |  INTERSECT ALL
      |  SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH')
      |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  /** Bag-semantics difference: multiplicities subtract (m − n, floor 0). */
  def qExceptAll(spark: SparkSession, sfDir: String): DataFrame =
    orderCustkeys(spark, sfDir, "1-URGENT")
      .exceptAll(orderCustkeys(spark, sfDir, "2-HIGH"))
      .groupBy("o_custkey").agg(count(lit(1)).as("multiplicity"))
      .orderBy("o_custkey")

  val qExceptAllSql: String =
    """SELECT o_custkey, count(*) AS multiplicity FROM (
      |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |  EXCEPT ALL
      |  SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH')
      |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  // ──────────────────────────── §2.11 subqueries ────────────────────────

  def qSubqScalar(spark: SparkSession, sfDir: String): DataFrame = {
    t(spark, sfDir, "customer").createOrReplaceTempView("customer")
    spark.sql(
      """SELECT c_custkey, round(c_acctbal, 4) AS bal FROM customer c
        |WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
        |                   WHERE c2.c_nationkey = c.c_nationkey)
        |ORDER BY c_custkey""".stripMargin)
  }

  val qSubqScalarSql: String =
    """SELECT c_custkey, round(c_acctbal, 4) AS bal FROM customer c
      |WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
      |                   WHERE c2.c_nationkey = c.c_nationkey)
      |ORDER BY c_custkey""".stripMargin

  def qSubqIn(spark: SparkSession, sfDir: String): DataFrame = {
    t(spark, sfDir, "customer").createOrReplaceTempView("customer")
    t(spark, sfDir, "orders").createOrReplaceTempView("orders")
    spark.sql(
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 4) AS price
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer
        |                    WHERE c_mktsegment = 'BUILDING')
        |ORDER BY o_orderkey""".stripMargin)
  }

  val qSubqInSql: String =
    """SELECT o_orderkey, o_custkey, round(o_totalprice, 4) AS price
      |FROM orders
      |WHERE o_custkey IN (SELECT c_custkey FROM customer
      |                    WHERE c_mktsegment = 'BUILDING')
      |ORDER BY o_orderkey""".stripMargin

  /** Correlated EXISTS and NOT EXISTS in one query: customers that
    * placed an urgent order but never a fulfilled one. Catalyst plans
    * both as semi/anti joins on c_custkey — one shuffle each, no
    * per-row subquery execution. */
  def qSubqExists(spark: SparkSession, sfDir: String): DataFrame = {
    t(spark, sfDir, "customer").createOrReplaceTempView("customer")
    t(spark, sfDir, "orders").createOrReplaceTempView("orders")
    spark.sql(qSubqExistsSql)
  }

  val qSubqExistsSql: String =
    """SELECT c_custkey, round(c_acctbal, 4) AS bal FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey
      |                AND o.o_orderpriority = '1-URGENT')
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_orderstatus = 'F')
      |ORDER BY c_custkey""".stripMargin
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Relational breadth beyond the §2.1–2.7 core: pivot/unpivot reshaping,
  * ordered string aggregation, deterministic mode, bitwise/struct scalar
  * surfaces, and a salt-based skew-join pattern (SURVEY.md §2.14).
  *
  * Same conventions as [[Relational]]: total ORDER BY, round(_, 4) on
  * doubles, explicit null ordering where nulls can appear.
  */
object RelationalPlus {

  // ─────────────────────────── pivot / unpivot ──────────────────────────

  /** Wide pivot: order totals by priority × status. Pivot values are
    * pinned explicitly — at scale an unpinned pivot needs a distinct-scan
    * planning pass over the full fact table.
    */
  def qPivot(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(round(sum("o_totalprice"), 4))
      .withColumnRenamed("F", "total_f")
      .withColumnRenamed("O", "total_o")
      .withColumnRenamed("P", "total_p")
      .orderBy("o_orderpriority")

  val qPivotSql: String =
    """SELECT o_orderpriority,
      |  round(sum(CASE WHEN o_orderstatus='F' THEN o_totalprice END), 4) AS total_f,
      |  round(sum(CASE WHEN o_orderstatus='O' THEN o_totalprice END), 4) AS total_o,
      |  round(sum(CASE WHEN o_orderstatus='P' THEN o_totalprice END), 4) AS total_p
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Long unpivot (melt): part's numeric measures to (key, metric, val)
    * rows via the native unpivot operator (single narrow pass; the
    * UNION-ALL equivalent re-scans the table per measure).
    */
  def qUnpivot(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "part")
      .select(col("p_partkey"), col("p_size").cast("double").as("p_size"),
        col("p_retailprice"))
      .unpivot(Array(col("p_partkey")),
        Array(col("p_size"), col("p_retailprice")), "metric", "val")
      .withColumn("val", round(col("val"), 4))
      .orderBy("p_partkey", "metric")

  val qUnpivotSql: String =
    """SELECT p_partkey, metric, round(val, 4) AS val FROM (
      |  SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS val FROM part
      |  UNION ALL
      |  SELECT p_partkey, 'p_retailprice', p_retailprice FROM part
      |) ORDER BY p_partkey, metric""".stripMargin

  // ──────────────────── ordered string agg / mode ───────────────────────

  /** listagg/string_agg with deterministic ordering: supplier roster per
    * nation. sort_array(collect_list(...)) gives an engine-portable total
    * order regardless of shuffle arrival order.
    */
  def qAggListagg(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "supplier")
      .join(broadcast(t(spark, sfDir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(
        concat_ws(",", sort_array(collect_list("s_name"))).as("suppliers"),
        count(lit(1)).as("n_suppliers"))
      .orderBy("n_name")

  val qAggListaggSql: String =
    """SELECT n_name, string_agg(s_name, ',' ORDER BY s_name) AS suppliers,
      |  count(*) AS n_suppliers
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** Deterministic per-group mode: most frequent brand per part type,
    * ties broken by brand asc. Built-in mode() has engine-defined ties, so
    * both sides use the count + row_number formulation.
    */
  def qAggMode(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = t(spark, sfDir, "part")
      .groupBy("p_type", "p_brand").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("p_type").orderBy(desc("c"), asc("p_brand"))
    counts.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("p_type"), col("p_brand").as("mode_brand"),
        col("c").as("n"))
      .orderBy("p_type")
  }

  val qAggModeSql: String =
    """SELECT p_type, p_brand AS mode_brand, c AS n FROM (
      |  SELECT p_type, p_brand, count(*) AS c,
      |    row_number() OVER (PARTITION BY p_type
      |                       ORDER BY count(*) DESC, p_brand) AS rn
      |  FROM part GROUP BY p_type, p_brand
      |) WHERE rn = 1 ORDER BY p_type""".stripMargin

  // ─────────────────────── bitwise / struct scalars ─────────────────────

  /** Bitwise surface: AND/OR/XOR/shifts/popcount on integer keys.
    * DuckDB's `^` is exponentiation, so the oracle uses xor(). */
  def qFnBitwise(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .select(
        col("o_orderkey"),
        (col("o_orderkey").bitwiseAND(lit(255L))).as("k_and"),
        (col("o_orderkey").bitwiseOR(col("o_custkey"))).as("k_or"),
        (col("o_orderkey").bitwiseXOR(col("o_custkey"))).as("k_xor"),
        shiftleft(col("o_orderkey"), 3).as("k_shl"),
        shiftright(col("o_orderkey"), 2).as("k_shr"),
        bit_count(col("o_orderkey")).cast("int").as("k_pop"))
      .orderBy("o_orderkey")

  val qFnBitwiseSql: String =
    """SELECT o_orderkey,
      |  o_orderkey & 255 AS k_and,
      |  o_orderkey | o_custkey AS k_or,
      |  xor(o_orderkey, o_custkey) AS k_xor,
      |  o_orderkey << 3 AS k_shl,
      |  o_orderkey >> 2 AS k_shr,
      |  CAST(bit_count(o_orderkey) AS INT) AS k_pop
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** Struct build + field access + struct-valued comparison ordering:
    * top-50 orders by (totalprice desc, key asc) selected via a struct
    * sort key, fields projected back out.
    */
  def qFnStruct(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .withColumn("sk",
        struct((-col("o_totalprice")).as("np"), col("o_orderkey").as("k")))
      .orderBy("sk")
      .limit(50)
      .select(col("o_orderkey"), col("sk.k").as("sk_key"),
        round(-col("sk.np"), 4).as("price"))
      .orderBy(desc("price"), asc("o_orderkey"))

  val qFnStructSql: String =
    """SELECT o_orderkey, sk.k AS sk_key, round(-sk.np, 4) AS price FROM (
      |  SELECT o_orderkey,
      |    {'np': -o_totalprice, 'k': o_orderkey} AS sk
      |  FROM orders ORDER BY sk LIMIT 50
      |) ORDER BY price DESC, o_orderkey""".stripMargin

  // ───────────────────────── skew-salted join ───────────────────────────

  /** Salt-based skew join: the dim side is exploded into SALT replicas and
    * the fact side picks a deterministic salt, so one hot key spreads over
    * SALT reducers instead of one. The result is identical to the plain
    * join — which is exactly what the oracle checks.
    *
    * The fact salt is a hash over per-row attributes, NOT
    * `l_linenumber % SALT`: linenumber is 1..7, so a modulo salt never
    * hits 0 (1/SALT of every exploded dim replica shuffles and matches
    * nothing) and concentrates a hot key on salt=1 (every order has a
    * line 1, few have a line 7) instead of spreading it uniformly.
    */
  private val SALT = 8

  def qJoinSalted(spark: SparkSession, sfDir: String): DataFrame = {
    val li = t(spark, sfDir, "lineitem")
      .withColumn("salt",
        pmod(hash(col("l_partkey"), col("l_linenumber")), lit(SALT)))
    val od = t(spark, sfDir, "orders")
      .withColumn("salt", explode(sequence(lit(0), lit(SALT - 1))))
    li.join(od,
        li("l_orderkey") === od("o_orderkey") && li("salt") === od("salt"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
          .as("revenue"))
      .orderBy("o_orderpriority")
  }

  val qJoinSaltedSql: String =
    """SELECT o_orderpriority, count(*) AS n_items,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Conditional aggregation surface: count_if / bool_and / bool_or /
    * filtered sum. The when()-based sum is null-skipping, identical to
    * SQL's FILTER clause. */
  def qAggCondagg(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n"),
        expr("count_if(o_totalprice > 100000)").as("n_big"),
        expr("bool_and(o_orderstatus = 'F')").as("all_f"),
        expr("bool_or(o_orderstatus = 'P')").as("any_p"),
        round(sum(when(col("o_orderstatus") === "O", col("o_totalprice"))), 4)
          .as("open_total"))
      .orderBy("o_orderpriority")

  val qAggCondaggSql: String =
    """SELECT o_orderpriority, count(*) AS n,
      |  count(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
      |  bool_and(o_orderstatus = 'F') AS all_f,
      |  bool_or(o_orderstatus = 'P') AS any_p,
      |  round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 4)
      |    AS open_total
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** first_value / last_value / nth_value over the full partition frame:
    * per supplier, the earliest / latest / second shipment's price
    * (deterministic order keys throughout). Plan (round 11): the
    * full-frame window formulation sorts and shuffles the WHOLE fact
    * inside supplier partitions that grow with the corpus, then
    * distincts ~|fact| identical rows down to |suppliers|. The same
    * answer is three PARTIAL-AGGREGABLE struct extrema — first = min,
    * last = max over the (shipdate, orderkey, linenumber, price)
    * lexicographic order, second = min excluding each group's first
    * (rows are unique on the order key, so "min after removing the
    * min" IS the second row) — so the shuffle carries one struct per
    * (group, map task) instead of every row, and the |suppliers|-row
    * firsts broadcast back for the exclusion. Measured 1.9 → 0.5 s
    * warm at sf0.1; the window stays the oracle formulation, which
    * pins the rewrite's equivalence row-for-row.
    */
  def qWinFirstLast(spark: SparkSession, sfDir: String): DataFrame = {
    val fact = t(spark, sfDir, "lineitem")
      .select(col("l_suppkey"),
        struct(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice")).as("s"))
    val fl = fact.groupBy("l_suppkey")
      .agg(min("s").as("f"), max("s").as("l"))
    val second = fact
      .join(broadcast(fl.select(col("l_suppkey"), col("f"))), "l_suppkey")
      .filter(col("s") =!= col("f"))
      .groupBy("l_suppkey").agg(min("s").as("s2"))
    fl.join(second, Seq("l_suppkey"), "left")
      .select(col("l_suppkey"),
        round(col("f.l_extendedprice"), 4).as("first_price"),
        round(col("l.l_extendedprice"), 4).as("last_price"),
        round(col("s2.l_extendedprice"), 4).as("second_price"))
      .orderBy("l_suppkey")
  }

  val qWinFirstLastSql: String =
    """SELECT DISTINCT l_suppkey,
      |  round(first_value(l_extendedprice) OVER w, 4) AS first_price,
      |  round(last_value(l_extendedprice) OVER w, 4) AS last_price,
      |  round(nth_value(l_extendedprice, 2) OVER w, 4) AS second_price
      |FROM lineitem
      |WINDOW w AS (PARTITION BY l_suppkey
      |  ORDER BY l_shipdate, l_orderkey, l_linenumber
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY l_suppkey""".stripMargin

  /** Correlated LATERAL join: top-2 suppliers by account balance per
    * nation — the per-row-subquery shape (Catalyst decorrelates it into
    * a join; DuckDB runs the lateral directly). */
  def qJoinLateral(spark: SparkSession, sfDir: String): DataFrame = {
    t(spark, sfDir, "nation").createOrReplaceTempView("nation")
    t(spark, sfDir, "supplier").createOrReplaceTempView("supplier")
    spark.sql(
      """SELECT n_name, s_name, round(s_acctbal, 4) AS bal
        |FROM nation,
        |LATERAL (SELECT s_name, s_acctbal FROM supplier
        |         WHERE s_nationkey = n_nationkey
        |         ORDER BY s_acctbal DESC, s_name LIMIT 2)
        |ORDER BY n_name, bal DESC, s_name""".stripMargin)
  }

  val qJoinLateralSql: String =
    """SELECT n_name, s_name, round(s_acctbal, 4) AS bal
      |FROM nation,
      |LATERAL (SELECT s_name, s_acctbal FROM supplier
      |         WHERE s_nationkey = n_nationkey
      |         ORDER BY s_acctbal DESC, s_name LIMIT 2) t
      |ORDER BY n_name, bal DESC, s_name""".stripMargin

  /** Schema-evolving union: legs with different columns aligned by NAME,
    * missing columns null-filled — the heterogeneous-batch append shape
    * (schema drift across ingestion generations). */
  def qUnionByname(spark: SparkSession, sfDir: String): DataFrame = {
    val a = t(spark, sfDir, "customer")
      .select(col("c_custkey").as("id"),
        round(col("c_acctbal"), 4).as("bal"), lit("cust").as("src"))
    val b = t(spark, sfDir, "supplier")
      .select(col("s_suppkey").as("id"), col("s_name").as("sname"),
        lit("supp").as("src"))
    a.unionByName(b, allowMissingColumns = true)
      .orderBy("src", "id")
  }

  val qUnionBynameSql: String =
    """SELECT * FROM (
      |  SELECT c_custkey AS id, round(c_acctbal, 4) AS bal, 'cust' AS src
      |  FROM customer
      |  UNION ALL BY NAME
      |  SELECT s_suppkey AS id, s_name AS sname, 'supp' AS src
      |  FROM supplier)
      |ORDER BY src, id""".stripMargin

  /** Trig/hyperbolic scalar surface. round(4) absorbs any last-ulp libm
    * differences between engines. */
  def qFnTrig(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "part")
      .select(col("p_partkey"),
        round(sin(col("p_retailprice") / 1000.0), 4).as("v_sin"),
        round(cos(col("p_retailprice") / 1000.0), 4).as("v_cos"),
        round(tan(col("p_size") / 100.0), 4).as("v_tan"),
        round(atan2(col("p_size").cast("double"), lit(7.0)), 4).as("v_atan2"),
        round(degrees(col("p_size") / 100.0), 4).as("v_deg"),
        round(radians(col("p_size").cast("double")), 4).as("v_rad"),
        round(asin(col("p_size") / 100.0), 4).as("v_asin"))
      .orderBy("p_partkey")

  val qFnTrigSql: String =
    """SELECT p_partkey,
      |  round(sin(p_retailprice / 1000.0), 4) AS v_sin,
      |  round(cos(p_retailprice / 1000.0), 4) AS v_cos,
      |  round(tan(p_size / 100.0), 4) AS v_tan,
      |  round(atan2(CAST(p_size AS DOUBLE), 7.0), 4) AS v_atan2,
      |  round(degrees(p_size / 100.0), 4) AS v_deg,
      |  round(radians(CAST(p_size AS DOUBLE)), 4) AS v_rad,
      |  round(asin(p_size / 100.0), 4) AS v_asin
      |FROM part ORDER BY p_partkey""".stripMargin

  /** Fixed-width histogram of order totals (20 × 25k buckets, clamped):
    * the single-shuffle binned-aggregation shape dashboards are built
    * on. Bucketing by arithmetic (not width_bucket) keeps the
    * formulation engine-portable.
    */
  def qAggHist(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .withColumn("bucket",
        least(greatest(floor(col("o_totalprice") / 25000.0), lit(0.0)),
          lit(19.0)).cast("int"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        round(sum("o_totalprice"), 4).as("total"))
      .orderBy("bucket")

  val qAggHistSql: String =
    """SELECT CAST(least(greatest(floor(o_totalprice / 25000.0), 0), 19)
      |    AS INT) AS bucket,
      |  count(*) AS n, round(sum(o_totalprice), 4) AS total
      |FROM orders GROUP BY bucket ORDER BY bucket""".stripMargin

  /** Bin width of the per-type value histogram sketch, exact cents: $5
    * over a [0, 490] value domain → ~98 live bins per group. */
  private[graft] val ApproxPctBinCents = 500L

  /** Approximate percentiles via a MERGEABLE fixed-grid histogram
    * sketch next to the exact values — the single-pass partial-agg path
    * a 100 TB percentile actually takes (bin counters ADD, so partial
    * sketches combine order-free map-side and any rollup level merges
    * without a rescan — the q_pct_sketch_union pattern). Graduated from
    * oracle=unit in round 12: unlike the previous `approx_percentile`
    * form (Spark's QuantileSummaries internals are engine-specific),
    * the fixed grid is ENGINE-PORTABLE — values quantize to exact cents
    * (round(100·v): both engines round the same double), bins by
    * integer division, ranks kq = ⌈q·n⌉ in exact integer arithmetic,
    * and the estimate is the lower bin edge holding the kq-th value,
    * within one bin width of the true order statistic BY CONSTRUCTION
    * (PipelineExtraSpec still asserts the bound in-engine). The exact
    * percentiles ride along as audit columns.
    */
  def qAggApproxPct(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val binned = graft.Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr(s"cast(round(value * 100) as bigint) div $ApproxPctBinCents")
          .as("bin"))
      .groupBy("event_type", "bin")
      .agg(count(lit(1)).as("cnt"))
    val totals = binned.groupBy("event_type").agg(sum("cnt").as("n"))
    val wCum = Window.partitionBy("event_type").orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = binned.withColumn("cum", sum("cnt").over(wCum))
    // integer ops only (`div`, long ×): Column./ promotes to double
    def estFloor(kExpr: String) =
      min(when(col("cum") >= expr(kExpr), col("bin"))) *
        lit(ApproxPctBinCents)
    val approx = cum.join(totals, "event_type")
      .groupBy("event_type", "n")
      .agg(estFloor("(n + 1) div 2").as("p50_cents"),
        estFloor("(n * 9 + 9) div 10").as("p90_cents"))
    val exact = graft.Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(round(expr("percentile(value, 0.5)"), 4).as("p50_exact"),
        round(expr("percentile(value, 0.9)"), 4).as("p90_exact"))
    approx.join(exact, "event_type")
      .select(col("event_type"), col("n"), col("p50_cents"),
        col("p50_exact"), col("p90_cents"), col("p90_exact"))
      .orderBy("event_type")
  }

  val qAggApproxPctSql: String =
    s"""WITH binned AS (SELECT event_type,
      |    CAST(round(value * 100) AS BIGINT) // $ApproxPctBinCents AS bin,
      |    count(*) AS cnt
      |  FROM events GROUP BY event_type, bin),
      |tot AS (SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n
      |  FROM binned GROUP BY event_type),
      |cum AS (SELECT event_type, bin,
      |    sum(cnt) OVER (PARTITION BY event_type ORDER BY bin
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM binned),
      |approx AS (SELECT c.event_type, t.n,
      |    CAST(min(CASE WHEN c.cum >= (t.n + 1) // 2 THEN c.bin END)
      |      * $ApproxPctBinCents AS BIGINT) AS p50_cents,
      |    CAST(min(CASE WHEN c.cum >= (t.n * 9 + 9) // 10 THEN c.bin END)
      |      * $ApproxPctBinCents AS BIGINT) AS p90_cents
      |  FROM cum c JOIN tot t USING (event_type)
      |  GROUP BY c.event_type, t.n),
      |exact AS (SELECT event_type,
      |    round(percentile_cont(0.5) WITHIN GROUP (ORDER BY value), 4)
      |      AS p50_exact,
      |    round(percentile_cont(0.9) WITHIN GROUP (ORDER BY value), 4)
      |      AS p90_exact
      |  FROM events GROUP BY event_type)
      |SELECT a.event_type, a.n, a.p50_cents, e.p50_exact,
      |  a.p90_cents, e.p90_exact
      |FROM approx a JOIN exact e USING (event_type)
      |ORDER BY event_type""".stripMargin

  // ───────── null-safe equality join (round 7, wave 5) ─────────

  /** Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): the join
    * semantics where NULL keys MATCH each other instead of vanishing —
    * what dedup/reconciliation joins over nullable business keys need
    * (a plain `=` silently drops every NULL-keyed row). Keys are made
    * nullable deterministically (BUILDING → NULL); the right side is
    * the per-key count table, so the output proves the NULL group
    * joined (one row per segment incl. the NULL one, with its matched
    * right-side count). Spark's `<=>` hash-partitions NULL like any
    * value — the join stays a broadcast/hash join, no special plan.
    */
  def qJoinNullSafe(spark: SparkSession, sfDir: String): DataFrame = {
    val a = t(spark, sfDir, "customer")
      .select(col("c_custkey"),
        nullif(col("c_mktsegment"), lit("BUILDING")).as("seg"))
    val b = a.groupBy(col("seg").as("rseg"))
      .agg(count(lit(1)).as("n_right"))
    a.join(broadcast(b), col("seg") <=> col("rseg"))
      .groupBy("seg")
      .agg(count(lit(1)).as("n_pairs"), max("n_right").as("n_right"))
      .orderBy(asc_nulls_first("seg"))
  }

  val qJoinNullSafeSql: String =
    """WITH a AS (SELECT c_custkey, nullif(c_mktsegment, 'BUILDING')
      |    AS seg FROM customer),
      |b AS (SELECT seg AS rseg, count(*) AS n_right FROM a GROUP BY seg)
      |SELECT a.seg, count(*) AS n_pairs,
      |  CAST(max(b.n_right) AS BIGINT) AS n_right
      |FROM a JOIN b ON a.seg IS NOT DISTINCT FROM b.rseg
      |GROUP BY a.seg ORDER BY a.seg ASC NULLS FIRST""".stripMargin
}

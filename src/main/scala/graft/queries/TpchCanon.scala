package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** TPC-H canon query shapes (SURVEY.md §2 round-6 extension): the
  * classic predicate-gated star-join benchmarks Q3/Q5/Q8/Q10/Q18,
  * re-expressed with this engine's exactness discipline. They differ
  * from `q_join_multiway` (ungated full-corpus rollup) in exactly the
  * ways a planner is graded: selective date/segment predicates that
  * must PUSH into the scans, cross-dimension equality conditions
  * beyond the join keys (Q5's local-supplier `c_nationkey =
  * s_nationkey`), conditional market-share numerators (Q8), and the
  * having-then-join-back shape (Q18).
  *
  * Exactness: revenue = Σ extendedprice·(1−discount) accumulates as
  * EXACT integers — price in cents (2 dp → ·100 lands within 1e-9 of
  * an integer, round is exact) times the integer percent (100−disc),
  * summed as decimal(38,0) (the q_basket_lift overflow discipline:
  * BIGINT e4-units blow past ~TPC-H sf10⁵; decimal widening keeps the
  * integral value, the oracle widens identically via HUGEINT). Display
  * cents come from ONE floor-div at the end — no float partial-sum
  * boundary anywhere (BASELINE.md "cross-engine float-sum boundary").
  */
object TpchCanon {

  /** Exact per-row revenue in e4-units (cents × percent), widened to
    * decimal(38,0) so group sums never overflow. */
  private val revE4 =
    expr("""CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
           |  * (100 - CAST(round(l_discount * 100) AS BIGINT))
           |  AS DECIMAL(38,0))""".stripMargin)

  private val revE4Sql =
    """CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
      |    * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS HUGEINT)"""
      .stripMargin

  /** TPC-H Q3 (shipping priority): top-10 undelivered orders of one
    * market segment by revenue. Scale: the segment filter (1/5 of a
    * FIXED-cardinality dim here — at true TPC-H scale customer grows,
    * and the same plan flips to a shuffle join on o_custkey without a
    * code change once the dim passes the broadcast threshold) and both
    * date predicates push into the parquet scans; orders⋈lineitem is
    * the one orderkey shuffle; top-10 is TakeOrdered (never a global
    * sort).
    */
  def qTpchQ3(spark: SparkSession, sfDir: String): DataFrame = {
    val cut = to_timestamp(lit("1998-06-30"))
    val cust = t(spark, sfDir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val od = t(spark, sfDir, "orders").filter(col("o_orderdate") < cut)
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
    t(spark, sfDir, "lineitem").filter(col("l_shipdate") > cut)
      .join(od, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg(sum(revE4).as("rev_e4"))
      .select(col("l_orderkey"),
        expr("CAST(rev_e4 DIV 100 AS BIGINT)").as("revenue_cents"),
        col("o_orderdate"), col("o_orderpriority"))
      .orderBy(desc("revenue_cents"), asc("l_orderkey"))
      .limit(10)
  }

  val qTpchQ3Sql: String =
    s"""SELECT l_orderkey,
       |  CAST(sum($revE4Sql) // 100 AS BIGINT) AS revenue_cents,
       |  o_orderdate, o_orderpriority
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1998-06-30'
       |  AND l_shipdate > TIMESTAMP '1998-06-30'
       |GROUP BY l_orderkey, o_orderdate, o_orderpriority
       |ORDER BY revenue_cents DESC, l_orderkey LIMIT 10""".stripMargin

  /** TPC-H Q5 (local supplier volume): revenue per nation for one
    * region-year where the CUSTOMER and the SUPPLIER sit in the same
    * nation — the cross-dimension equality (`c_nationkey =
    * s_nationkey`) that distinguishes this from a plain star rollup.
    * Scale: the year predicate prunes the orders scan; customer /
    * supplier / nation / region are broadcast dims; lineitem is
    * touched once and shuffles only on l_orderkey.
    */
  def qTpchQ5(spark: SparkSession, sfDir: String): DataFrame = {
    val asiaNations = t(spark, sfDir, "nation")
      .join(t(spark, sfDir, "region"), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA").select("n_nationkey", "n_name")
    val od = t(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= to_timestamp(lit("1997-01-01")) &&
        col("o_orderdate") < to_timestamp(lit("1998-01-01")))
      .select("o_orderkey", "o_custkey")
    val cust = t(spark, sfDir, "customer").select("c_custkey", "c_nationkey")
    val supp = t(spark, sfDir, "supplier").select("s_suppkey", "s_nationkey")
    t(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), revE4.as("r"))
      .join(od, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(sum(col("r")).as("rev_e4"))
      .select(col("n_name"),
        expr("CAST(rev_e4 DIV 100 AS BIGINT)").as("revenue_cents"))
      .orderBy(desc("revenue_cents"), asc("n_name"))
  }

  val qTpchQ5Sql: String =
    s"""SELECT n_name,
       |  CAST(sum($revE4Sql) // 100 AS BIGINT) AS revenue_cents
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |  AND c_nationkey = s_nationkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA'
       |  AND o_orderdate >= TIMESTAMP '1997-01-01'
       |  AND o_orderdate < TIMESTAMP '1998-01-01'
       |GROUP BY n_name ORDER BY revenue_cents DESC, n_name""".stripMargin

  /** TPC-H Q8 (national market share): per order-year, the share of
    * one supplier nation's revenue within one customer-region ×
    * part-type slice, as integer ppm. Scale: part (type filter) and
    * the two nation lookups broadcast; the conditional numerator is a
    * partial-aggregable CASE sum — share = ONE decimal floor-div per
    * year at the end, exact at any corpus size.
    */
  def qTpchQ8(spark: SparkSession, sfDir: String): DataFrame = {
    val pt = t(spark, sfDir, "part").filter(col("p_type") === "ECONOMY")
      .select("p_partkey")
    val amCust = t(spark, sfDir, "customer")
      .join(broadcast(t(spark, sfDir, "nation")
        .filter(col("n_regionkey") === 1).select("n_nationkey")),
        col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey")
    val suppNat = t(spark, sfDir, "supplier")
      .join(broadcast(t(spark, sfDir, "nation")
        .select(col("n_nationkey").as("snk"), col("n_name").as("s_nation"))),
        col("s_nationkey") === col("snk"))
      .select("s_suppkey", "s_nation")
    val od = t(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
        col("o_orderdate") <= to_timestamp(lit("1999-12-31")))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    t(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        revE4.as("r"))
      .join(broadcast(pt), col("l_partkey") === col("p_partkey"))
      .join(od, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(amCust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(suppNat), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        sum(when(col("s_nation") === "NATION_6", col("r"))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("nat_e4"),
        sum(col("r")).as("tot_e4"))
      .select(col("o_year"),
        expr("CAST((nat_e4 * 1000000) DIV tot_e4 AS BIGINT)")
          .as("mkt_share_ppm"),
        expr("CAST(tot_e4 DIV 100 AS BIGINT)").as("total_cents"))
      .orderBy("o_year")
  }

  val qTpchQ8Sql: String =
    s"""WITH f AS (SELECT year(o_orderdate) AS o_year,
       |    sum(CASE WHEN sn.n_name = 'NATION_6'
       |      THEN $revE4Sql ELSE 0 END) AS nat_e4,
       |    sum($revE4Sql) AS tot_e4
       |  FROM lineitem
       |  JOIN part ON l_partkey = p_partkey
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation cn ON c_nationkey = cn.n_nationkey
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN nation sn ON s_nationkey = sn.n_nationkey
       |  WHERE cn.n_regionkey = 1 AND p_type = 'ECONOMY'
       |    AND o_orderdate >= TIMESTAMP '1996-01-01'
       |    AND o_orderdate <= TIMESTAMP '1999-12-31'
       |  GROUP BY 1)
       |SELECT o_year,
       |  CAST((CAST(nat_e4 AS HUGEINT) * 1000000) // tot_e4 AS BIGINT)
       |    AS mkt_share_ppm,
       |  CAST(tot_e4 // 100 AS BIGINT) AS total_cents
       |FROM f ORDER BY o_year""".stripMargin

  /** TPC-H Q10 (returned items): top-20 customers by revenue lost to
    * returns in one quarter. Scale: the quarter predicate prunes the
    * orders scan and the returnflag predicate the lineitem scan;
    * grouping is on the customer key (partial-aggregable); the
    * customer attribute join-back happens AFTER the aggregate, on ≤
    * |customers| rows; top-20 is TakeOrdered.
    */
  def qTpchQ10(spark: SparkSession, sfDir: String): DataFrame = {
    val od = t(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= to_timestamp(lit("1997-10-01")) &&
        col("o_orderdate") < to_timestamp(lit("1998-01-01")))
      .select("o_orderkey", "o_custkey")
    val lost = t(spark, sfDir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), revE4.as("r"))
      .join(od, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(sum(col("r")).as("rev_e4"), count(lit(1)).as("n_items"))
    val cust = t(spark, sfDir, "customer")
      .join(broadcast(t(spark, sfDir, "nation")
        .select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey", "c_name", "c_acctbal", "n_name")
    lost.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"),
        expr("CAST(rev_e4 DIV 100 AS BIGINT)").as("lost_cents"),
        col("n_items"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("acctbal_cents"))
      .orderBy(desc("lost_cents"), asc("c_custkey"))
      .limit(20)
  }

  val qTpchQ10Sql: String =
    s"""SELECT c_custkey, c_name, n_name,
       |  CAST(sum($revE4Sql) // 100 AS BIGINT) AS lost_cents,
       |  count(*) AS n_items,
       |  CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE l_returnflag = 'R'
       |  AND o_orderdate >= TIMESTAMP '1997-10-01'
       |  AND o_orderdate < TIMESTAMP '1998-01-01'
       |GROUP BY c_custkey, c_name, n_name,
       |  CAST(round(c_acctbal * 100) AS BIGINT)
       |ORDER BY lost_cents DESC, c_custkey LIMIT 20""".stripMargin

  /** TPC-H Q18 (large-volume customer): orders whose line quantity
    * total exceeds a threshold, joined back to order + customer
    * attributes — the HAVING-then-join-back shape. Scale: the
    * quantity rollup is partial-aggregable on l_orderkey (the fact
    * table's natural key — map-side combine does most of the work);
    * the >250 filter cuts the relation to a sliver BEFORE the
    * attribute joins; quantities are integral doubles so the BIGINT
    * cast is exact; top-100 is TakeOrdered.
    */
  def qTpchQ18(spark: SparkSession, sfDir: String): DataFrame = {
    val big = t(spark, sfDir, "lineitem")
      .groupBy("l_orderkey")
      .agg(sum("l_quantity").as("q"))
      .filter(col("q") > 250)
    big.join(t(spark, sfDir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(spark, sfDir, "customer")
        .select("c_custkey", "c_name")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)")
          .as("totalprice_cents"),
        col("q").cast("long").as("total_qty"))
      .orderBy(desc("totalprice_cents"), asc("o_orderkey"))
      .limit(100)
  }

  val qTpchQ18Sql: String =
    """WITH big AS (SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) AS q
      |  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 250)
      |SELECT c_custkey, c_name, o_orderkey, o_orderdate,
      |  CAST(round(o_totalprice * 100) AS BIGINT) AS totalprice_cents,
      |  q AS total_qty
      |FROM big JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY totalprice_cents DESC, o_orderkey LIMIT 100""".stripMargin

  /** TPC-H Q15 (top supplier): supplier(s) whose quarterly revenue
    * equals the maximum — the scalar-subquery-max shape, where the
    * equality must hold EXACTLY (ties all surface; TPC-H's view-based
    * formulation demands it). Exact decimal revenue makes the equality
    * engine-portable — a float revenue here would make tie membership
    * depend on partial-sum merge order. Scale: the quarter predicate
    * prunes the lineitem scan; one supplier-keyed partial aggregate;
    * the max is a 1-row broadcast; the dim join-back touches ≤
    * |suppliers| rows.
    */
  def qTpchQ15(spark: SparkSession, sfDir: String): DataFrame = {
    val rev = t(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1997-04-01")))
      .groupBy("l_suppkey")
      .agg(sum(revE4).as("rev_e4"))
    val mx = rev.agg(max("rev_e4").as("mx"))
    rev.crossJoin(broadcast(mx))
      .filter(col("rev_e4") === col("mx"))
      .join(broadcast(t(spark, sfDir, "supplier")
        .select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        expr("CAST(rev_e4 DIV 100 AS BIGINT)").as("revenue_cents"))
      .orderBy("s_suppkey")
  }

  val qTpchQ15Sql: String =
    s"""WITH rev AS (SELECT l_suppkey, sum($revE4Sql) AS rev_e4
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
       |    AND l_shipdate < TIMESTAMP '1997-04-01'
       |  GROUP BY 1)
       |SELECT s_suppkey, s_name,
       |  CAST(rev_e4 // 100 AS BIGINT) AS revenue_cents
       |FROM rev JOIN supplier ON l_suppkey = s_suppkey
       |WHERE rev_e4 = (SELECT max(rev_e4) FROM rev)
       |ORDER BY s_suppkey""".stripMargin

  /** TPC-H Q7 (volume shipping): bilateral trade between two nations,
    * per (supplier nation, customer nation, ship year) — the
    * disjunctive two-sided nation gate ((A→B) OR (B→A)) that a planner
    * must keep as a join-level residual while still broadcasting both
    * dims. Scale: the ship-date window prunes the lineitem scan; both
    * nation lookups ride broadcast dim joins; one orderkey shuffle.
    */
  def qTpchQ7(spark: SparkSession, sfDir: String): DataFrame = {
    val nat = t(spark, sfDir, "nation").select("n_nationkey", "n_name")
    val supp = t(spark, sfDir, "supplier")
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = t(spark, sfDir, "customer")
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val od = t(spark, sfDir, "orders").select("o_orderkey", "o_custkey")
    t(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1999-01-01")))
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).cast("long").as("l_year"), revE4.as("r"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(od, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .filter((col("supp_nation") === "NATION_18" &&
          col("cust_nation") === "NATION_19") ||
        (col("supp_nation") === "NATION_19" &&
          col("cust_nation") === "NATION_18"))
      .groupBy("supp_nation", "cust_nation", "l_year")
      .agg(sum(col("r")).as("rev_e4"), count(lit(1)).as("n_items"))
      .select(col("supp_nation"), col("cust_nation"), col("l_year"),
        expr("CAST(rev_e4 DIV 100 AS BIGINT)").as("revenue_cents"),
        col("n_items"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  val qTpchQ7Sql: String =
    s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
       |  CAST(sum($revE4Sql) // 100 AS BIGINT) AS revenue_cents,
       |  count(*) AS n_items
       |FROM lineitem
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation n1 ON s_nationkey = n1.n_nationkey
       |JOIN nation n2 ON c_nationkey = n2.n_nationkey
       |WHERE ((n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
       |    OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18'))
       |  AND l_shipdate >= TIMESTAMP '1996-01-01'
       |  AND l_shipdate < TIMESTAMP '1999-01-01'
       |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  /** TPC-H Q19 (discounted revenue): disjunction of conjunctive
    * brand/size/quantity ranges — the OR-of-ANDs predicate shape. The
    * quantity legs reference ONLY lineitem and the brand/size legs ONLY
    * part, so a correct planner pushes the quantity-range DISJUNCTION
    * (qty ∈ [1,20] ∪ [10,40] ⇒ qty ∈ [1,40]) into the fact scan and the
    * brand/size disjunction into the (broadcast) dim scan, evaluating
    * the cross-table residual only on join survivors — asserted in
    * PlanAuditSpec. Output: exact revenue + item count per brand leg.
    */
  def qTpchQ19(spark: SparkSession, sfDir: String): DataFrame = {
    val pt = t(spark, sfDir, "part").select("p_partkey", "p_brand", "p_size")
    t(spark, sfDir, "lineitem")
      .select(col("l_partkey"), col("l_quantity"), revE4.as("r"))
      .join(broadcast(pt), col("l_partkey") === col("p_partkey"))
      .filter((col("p_brand") === "Brand#1" &&
          col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 20)) ||
        (col("p_brand") === "Brand#2" &&
          col("p_size").between(10, 30) &&
          col("l_quantity").between(10, 40)))
      .groupBy("p_brand")
      .agg(sum(col("r")).as("rev_e4"), count(lit(1)).as("n_items"))
      .select(col("p_brand"),
        expr("CAST(rev_e4 DIV 100 AS BIGINT)").as("revenue_cents"),
        col("n_items"))
      .orderBy("p_brand")
  }

  val qTpchQ19Sql: String =
    s"""SELECT p_brand,
       |  CAST(sum($revE4Sql) // 100 AS BIGINT) AS revenue_cents,
       |  count(*) AS n_items
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       |    AND l_quantity BETWEEN 1 AND 20)
       |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
       |    AND l_quantity BETWEEN 10 AND 40)
       |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** TPC-H Q22 shape (global sales opportunity): wealthy low-activity
    * customers per nation — account balance above the positive-balance
    * average (the scalar-subquery gate) and at most 2 orders (the
    * anti-join gate; this corpus has no order-less customers, so the
    * classic NOT EXISTS is thresholded at ≤2 to stay non-degenerate).
    * Exactness: the "above average" test cross-multiplies exact integer
    * cents — c_cents · n > sum_cents — because a float avg sits one
    * partial-sum merge away from flipping a boundary customer. Scale:
    * the average is a 1-row broadcast; the per-customer order count is
    * one partial-aggregable pass on the custkey; output is
    * nation-bounded.
    */
  def qTpchQ22(spark: SparkSession, sfDir: String): DataFrame = {
    val cents = expr("CAST(round(c_acctbal * 100) AS BIGINT)")
    val cust = t(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_nationkey"), cents.as("c_cents"))
    val avgPos = cust.filter(col("c_cents") > 0)
      .agg(sum("c_cents").as("sum_cents"), count(lit(1)).as("n_pos"))
    val ordCnt = t(spark, sfDir, "orders")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_ord"))
    cust
      .join(ordCnt, cust("c_custkey") === ordCnt("o_custkey"), "left")
      .withColumn("n_ord", coalesce(col("n_ord"), lit(0L)))
      .crossJoin(broadcast(avgPos))
      .filter(col("c_cents") * col("n_pos") > col("sum_cents") &&
        col("n_ord") <= 2)
      .join(broadcast(t(spark, sfDir, "nation")
        .select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_cust"), sum("c_cents").as("acctbal_cents"))
      .orderBy("n_name")
  }

  val qTpchQ22Sql: String =
    """WITH cust AS (SELECT c_custkey, c_nationkey,
      |    CAST(round(c_acctbal * 100) AS BIGINT) AS c_cents
      |  FROM customer),
      |ap AS (SELECT CAST(sum(c_cents) AS BIGINT) AS sum_cents,
      |    CAST(count(*) AS BIGINT) AS n_pos
      |  FROM cust WHERE c_cents > 0),
      |oc AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_ord
      |  FROM orders GROUP BY 1)
      |SELECT n_name, count(*) AS n_cust,
      |  CAST(sum(c_cents) AS BIGINT) AS acctbal_cents
      |FROM cust
      |LEFT JOIN oc ON c_custkey = o_custkey
      |CROSS JOIN ap
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE c_cents * n_pos > sum_cents
      |  AND coalesce(n_ord, 0) <= 2
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** TPC-H Q6 (forecast revenue change): one pruned scan + one global
    * sum — the purest pushdown benchmark. Exactness: the discount-band
    * predicate compares the INTEGER percent (round(disc·100) ∈ [5,7]) —
    * a raw double BETWEEN on 0.05/0.07 is engine-consistent here but
    * the integer form removes the ULP question entirely; discount
    * revenue accumulates as exact cents·pct e4-units. Scale: no join,
    * no shuffle beyond the final 1-row merge; all three predicates
    * reach the parquet scan.
    */
  def qTpchQ6(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1998-01-01")) &&
        col("l_quantity") < 24)
      .filter(expr("CAST(round(l_discount * 100) AS BIGINT)").between(5, 7))
      .agg(
        sum(expr("""CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                   |  * CAST(round(l_discount * 100) AS BIGINT)
                   |  AS DECIMAL(38,0))""".stripMargin)).as("disc_e4"),
        count(lit(1)).as("n_items"))
      .select(expr("CAST(disc_e4 DIV 100 AS BIGINT)").as("disc_revenue_cents"),
        col("n_items"))
      .orderBy("n_items")

  val qTpchQ6Sql: String =
    """SELECT CAST(sum(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
      |    * CAST(round(l_discount * 100) AS BIGINT) AS HUGEINT)) // 100
      |    AS BIGINT) AS disc_revenue_cents,
      |  count(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND l_quantity < 24
      |  AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
      |ORDER BY n_items""".stripMargin

  /** TPC-H Q13 (customer distribution): count-of-counts — how many
    * customers placed k orders, INCLUDING k = 0 via the left join (the
    * part a plain orders rollup misses). Scale: one custkey-keyed
    * partial aggregate, one left broadcast/shuffle join, then a second
    * aggregate over the bounded count domain.
    */
  def qTpchQ13(spark: SparkSession, sfDir: String): DataFrame = {
    val oc = t(spark, sfDir, "orders")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_ord"))
    t(spark, sfDir, "customer").select("c_custkey")
      .join(oc, col("c_custkey") === col("o_custkey"), "left")
      .withColumn("n_ord", coalesce(col("n_ord"), lit(0L)))
      .groupBy("n_ord").agg(count(lit(1)).as("n_cust"))
      .orderBy(desc("n_cust"), desc("n_ord"))
  }

  val qTpchQ13Sql: String =
    """WITH oc AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n
      |  FROM orders GROUP BY 1)
      |SELECT coalesce(n, 0) AS n_ord, count(*) AS n_cust
      |FROM customer LEFT JOIN oc ON c_custkey = o_custkey
      |GROUP BY 1 ORDER BY n_cust DESC, n_ord DESC""".stripMargin

  /** TPC-H Q14 (promotion effect): per ship-month of 1997, the ppm
    * share of revenue from PROMO-type parts — the conditional-share
    * shape over a calendar grid. Scale: part (type flag only)
    * broadcasts; one pruned fact pass; share = one decimal floor-div
    * per month over the 12-row grid.
    */
  def qTpchQ14(spark: SparkSession, sfDir: String): DataFrame = {
    val pt = t(spark, sfDir, "part")
      .select(col("p_partkey"), (col("p_type") === "PROMO").as("is_promo"))
    t(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1998-01-01")))
      .select(col("l_partkey"),
        date_trunc("month", col("l_shipdate")).cast("date").as("mon"),
        revE4.as("r"))
      .join(broadcast(pt), col("l_partkey") === col("p_partkey"))
      .groupBy("mon")
      .agg(sum(when(col("is_promo"), col("r"))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("promo_e4"),
        sum(col("r")).as("tot_e4"))
      .select(col("mon"),
        expr("CAST((promo_e4 * 1000000) DIV tot_e4 AS BIGINT)")
          .as("promo_ppm"),
        expr("CAST(tot_e4 DIV 100 AS BIGINT)").as("total_cents"))
      .orderBy("mon")
  }

  val qTpchQ14Sql: String =
    s"""WITH f AS (SELECT CAST(date_trunc('month', l_shipdate) AS DATE)
       |    AS mon,
       |    sum(CASE WHEN p_type = 'PROMO' THEN $revE4Sql ELSE 0 END)
       |      AS promo_e4,
       |    sum($revE4Sql) AS tot_e4
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
       |    AND l_shipdate < TIMESTAMP '1998-01-01'
       |  GROUP BY 1)
       |SELECT mon,
       |  CAST((CAST(promo_e4 AS HUGEINT) * 1000000) // tot_e4 AS BIGINT)
       |    AS promo_ppm,
       |  CAST(tot_e4 // 100 AS BIGINT) AS total_cents
       |FROM f ORDER BY mon""".stripMargin

  /** TPC-H Q17 (small-quantity-order revenue): lineitems below half
    * their part's average quantity — the per-group-scalar correlated
    * subquery, decorrelated into a partkey rollup + join-back.
    * Exactness: qty < avg/2 cross-multiplies to 2·qty·cnt < Σqty in
    * exact BIGINTs (quantities are integral) — the float avg would put
    * boundary rows one merge-order away from flipping. Scale: both
    * sides of the join-back shuffle on the partkey (per-part groups are
    * bounded); output is one global sum; avg_yearly = total div 7 (the
    * TPC-H convention).
    */
  def qTpchQ17(spark: SparkSession, sfDir: String): DataFrame = {
    val pa = t(spark, sfDir, "lineitem")
      .groupBy(col("l_partkey").as("pk"))
      .agg(sum(col("l_quantity").cast("long")).as("sq"),
        count(lit(1)).as("cnt"))
    t(spark, sfDir, "lineitem")
      .select(col("l_partkey"), col("l_quantity").cast("long").as("q"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"))
      .join(pa, col("l_partkey") === col("pk"))
      .filter(lit(2L) * col("q") * col("cnt") < col("sq"))
      .agg(count(lit(1)).as("n_items"), sum("cents").as("total_cents"))
      .select(col("n_items"), col("total_cents"),
        expr("CAST(total_cents DIV 7 AS BIGINT)").as("avg_yearly_cents"))
      .orderBy("n_items")
  }

  val qTpchQ17Sql: String =
    """WITH pa AS (SELECT l_partkey AS pk,
      |    CAST(sum(l_quantity) AS BIGINT) AS sq,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM lineitem GROUP BY 1)
      |SELECT count(*) AS n_items,
      |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |    AS total_cents,
      |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) // 7
      |    AS BIGINT) AS avg_yearly_cents
      |FROM lineitem JOIN pa ON l_partkey = pk
      |WHERE 2 * CAST(l_quantity AS BIGINT) * cnt < sq
      |ORDER BY n_items""".stripMargin
}

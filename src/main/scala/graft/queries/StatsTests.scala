package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-9 distributed-statistics wave (SURVEY.md §2.20): the k-group
  * tests and effect sizes that complete the two-sample drift kit
  * ([[PipelineAudit.qStatsWelch]] / Mann-Whitney / KS / chi-square) —
  * one-way ANOVA, Brown–Forsythe variance homogeneity, Kruskal–Wallis,
  * Jarque–Bera normality, Cohen's d, the regr_* linear-fit surface, a
  * rolling cross-correlation, and a deterministic differential-privacy
  * noise operator.
  *
  * Determinism across engines (the house discipline): every corpus-sized
  * accumulation is either an exact integer (counts, cents, rank sums on
  * the bounded value grid) or a mergeable moment aggregate already
  * proven stable at round(4) by the Welch/corr precedents; ln/exp appear
  * only in per-row or per-group closing expressions, never inside a
  * float sum.
  */
object StatsTests {

  // ─────────────── one-way ANOVA across market segments ───────────────

  /** One-way ANOVA F-test of account balance across the 5 market
    * segments — "does segment explain balance?", the k-group
    * generalization of [[PipelineAudit.qStatsWelch]]. Group moments
    * (n, mean, var_samp) are one partial-aggregable pass; the grand
    * mean is computed FIRST over the 5-row group table and broadcast
    * back, so SSB = Σ nⱼ(mⱼ−g)² is a centered sum of 5 non-negative
    * terms — no catastrophic cancellation of the Σnm² − (Σnm)²/N form.
    * Scale: one fact pass + arithmetic on a |segments|-row table.
    */
  def qStatsAnova(spark: SparkSession, sfDir: String): DataFrame = {
    val g = Tables.t(spark, sfDir, "customer")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("nj"), avg("c_acctbal").as("mj"),
        expr("var_samp(c_acctbal)").as("vj"))
    val grand = g.agg(
      (sum(col("nj") * col("mj")) / sum("nj")).as("gm"))
    g.crossJoin(broadcast(grand))
      .agg(count(lit(1)).as("k"), sum("nj").as("n"),
        sum(col("nj") * (col("mj") - col("gm")) * (col("mj") - col("gm")))
          .as("ssb"),
        sum((col("nj") - 1L) * col("vj")).as("ssw"))
      .select(col("k"), col("n"),
        round((col("ssb") / (col("k") - 1L)) /
          (col("ssw") / (col("n") - col("k"))), 4).as("f_stat"),
        round(col("ssb") / (col("ssb") + col("ssw")), 4).as("eta_sq"))
  }

  val qStatsAnovaSql: String =
    """WITH g AS (SELECT c_mktsegment, count(*) AS nj,
      |    avg(c_acctbal) AS mj, var_samp(c_acctbal) AS vj
      |  FROM customer GROUP BY c_mktsegment),
      |t AS (SELECT sum(nj * mj) / sum(nj) AS gm FROM g),
      |a AS (SELECT count(*) AS k, CAST(sum(nj) AS BIGINT) AS n,
      |    sum(nj * (mj - gm) * (mj - gm)) AS ssb,
      |    sum((nj - 1) * vj) AS ssw
      |  FROM g, t)
      |SELECT k, n,
      |  round((ssb / (k - 1)) / (ssw / (n - k)), 4) AS f_stat,
      |  round(ssb / (ssb + ssw), 4) AS eta_sq
      |FROM a ORDER BY n""".stripMargin

  // ───────── Brown–Forsythe variance-homogeneity test ─────────

  /** Brown–Forsythe (median-centered Levene) test of price-variance
    * homogeneity across the 5 order priorities — the check that the
    * equal-variance assumption behind a pooled test holds BEFORE
    * trusting it. Per-group medians are an exact interpolated
    * percentile (the q_agg_percentile cross-engine precedent),
    * broadcast back (|priorities| rows — the dim-table move); the W
    * statistic is then the ANOVA F over the absolute deviations,
    * computed with the same centered-SSB shape as [[qStatsAnova]].
    * Scale: two narrow fact passes + a 5-row broadcast.
    */
  def qStatsLevene(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.t(spark, sfDir, "orders")
      .select(col("o_orderpriority").as("grp"), col("o_totalprice").as("x"))
    val med = o.groupBy("grp").agg(expr("percentile(x, 0.5)").as("med"))
    val z = o.join(broadcast(med), "grp")
      .select(col("grp"), abs(col("x") - col("med")).as("z"))
    val g = z.groupBy("grp")
      .agg(count(lit(1)).as("nj"), avg("z").as("mj"),
        expr("var_samp(z)").as("vj"))
    val grand = g.agg((sum(col("nj") * col("mj")) / sum("nj")).as("gm"))
    g.crossJoin(broadcast(grand))
      .agg(count(lit(1)).as("k"), sum("nj").as("n"),
        sum(col("nj") * (col("mj") - col("gm")) * (col("mj") - col("gm")))
          .as("ssb"),
        sum((col("nj") - 1L) * col("vj")).as("ssw"))
      .select(col("k"), col("n"),
        round((col("ssb") / (col("k") - 1L)) /
          (col("ssw") / (col("n") - col("k"))), 4).as("w_stat"))
  }

  val qStatsLeveneSql: String =
    """WITH o AS (SELECT o_orderpriority AS grp, o_totalprice AS x
      |  FROM orders),
      |med AS (SELECT grp,
      |    percentile_cont(0.5) WITHIN GROUP (ORDER BY x) AS med
      |  FROM o GROUP BY grp),
      |z AS (SELECT o.grp, abs(x - med) AS z FROM o JOIN med USING (grp)),
      |g AS (SELECT grp, count(*) AS nj, avg(z) AS mj, var_samp(z) AS vj
      |  FROM z GROUP BY grp),
      |t AS (SELECT sum(nj * mj) / sum(nj) AS gm FROM g),
      |a AS (SELECT count(*) AS k, CAST(sum(nj) AS BIGINT) AS n,
      |    sum(nj * (mj - gm) * (mj - gm)) AS ssb,
      |    sum((nj - 1) * vj) AS ssw
      |  FROM g, t)
      |SELECT k, n,
      |  round((ssb / (k - 1)) / (ssw / (n - k)), 4) AS w_stat
      |FROM a ORDER BY n""".stripMargin

  // ───────── Jarque–Bera normality test per event type ─────────

  /** Jarque–Bera normality test of `value` per event type — skewness,
    * excess kurtosis, and the JB statistic, the gate before any test
    * that assumes normal residuals. Built from CENTERED power sums
    * (per-type means broadcast back, then Σd², Σd³, Σd⁴ in one pass)
    * rather than engine skewness()/kurtosis() builtins, whose bias
    * corrections differ between engines; centering bounds |d| ≤ 500 so
    * the d⁴ sums sit ~10⁶ above double noise. Scale: one 5-row
    * broadcast + one partial-aggregable moment pass.
    */
  def qStatsJb(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.t(spark, sfDir, "events")
      .select(col("event_type"), col("value"))
    val m = ev.groupBy("event_type").agg(avg("value").as("mu"))
    ev.join(broadcast(m), "event_type")
      .select(col("event_type"), (col("value") - col("mu")).as("d"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("d") * col("d")).as("s2"),
        sum(col("d") * col("d") * col("d")).as("s3"),
        sum(col("d") * col("d") * col("d") * col("d")).as("s4"))
      .select(col("event_type"), col("n"),
        round((col("s3") / col("n")) /
          pow(col("s2") / col("n"), 1.5), 4).as("skew"),
        round(col("n") * col("s4") / (col("s2") * col("s2")) - 3.0, 4)
          .as("ex_kurt"),
        round((col("n") / lit(6.0)) *
          (pow((col("s3") / col("n")) / pow(col("s2") / col("n"), 1.5), 2)
            + pow(col("n") * col("s4") / (col("s2") * col("s2")) - 3.0, 2)
              / 4.0), 4).as("jb"))
      .orderBy("event_type")
  }

  val qStatsJbSql: String =
    """WITH m AS (SELECT event_type, avg(value) AS mu
      |  FROM events GROUP BY event_type),
      |d AS (SELECT e.event_type, value - mu AS d
      |  FROM events e JOIN m USING (event_type)),
      |a AS (SELECT event_type, count(*) AS n,
      |    sum(d * d) AS s2, sum(d * d * d) AS s3,
      |    sum(d * d * d * d) AS s4
      |  FROM d GROUP BY event_type)
      |SELECT event_type, n,
      |  round((s3 / n) / pow(s2 / n, 1.5), 4) AS skew,
      |  round(n * s4 / (s2 * s2) - 3.0, 4) AS ex_kurt,
      |  round((n / 6.0) * (pow((s3 / n) / pow(s2 / n, 1.5), 2)
      |    + pow(n * s4 / (s2 * s2) - 3.0, 2) / 4.0), 4) AS jb
      |FROM a ORDER BY event_type""".stripMargin

  // ───────── Cohen's d / Hedges' g effect size ─────────

  /** Pooled-SD standardized effect size (Cohen's d with the Hedges
    * small-sample correction) for the click-vs-purchase `value` gap —
    * the magnitude companion to [[PipelineAudit.qStatsWelch]]'s
    * significance: a drift gate keys on "how big", not just "how
    * unlikely". Same single-pass conditional-moment shape as Welch;
    * the d/g arithmetic is a fixed-association closing expression.
    */
  def qStatsCohensD(spark: SparkSession, sfDir: String): DataFrame =
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
        round((col("m1") - col("m2")) /
          sqrt(((col("n1") - 1L) * col("v1") + (col("n2") - 1L) * col("v2"))
            / (col("n1") + col("n2") - 2L)), 4).as("cohens_d"),
        round(((col("m1") - col("m2")) /
          sqrt(((col("n1") - 1L) * col("v1") + (col("n2") - 1L) * col("v2"))
            / (col("n1") + col("n2") - 2L))) *
          (lit(1.0) - lit(3.0) / (lit(4.0) * (col("n1") + col("n2")) - 9.0)),
          4).as("hedges_g"))

  val qStatsCohensDSql: String =
    """WITH a AS (SELECT
      |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS n1,
      |    avg(CASE WHEN event_type = 'click' THEN value END) AS m1,
      |    var_samp(CASE WHEN event_type = 'click' THEN value END) AS v1,
      |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n2,
      |    avg(CASE WHEN event_type = 'purchase' THEN value END) AS m2,
      |    var_samp(CASE WHEN event_type = 'purchase' THEN value END) AS v2
      |  FROM events WHERE event_type IN ('click', 'purchase'))
      |SELECT CAST(n1 AS BIGINT) AS n_click, CAST(n2 AS BIGINT) AS n_purchase,
      |  round((m1 - m2) / sqrt(((n1 - 1) * v1 + (n2 - 1) * v2)
      |    / (n1 + n2 - 2)), 4) AS cohens_d,
      |  round(((m1 - m2) / sqrt(((n1 - 1) * v1 + (n2 - 1) * v2)
      |    / (n1 + n2 - 2)))
      |    * (1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0)), 4) AS hedges_g
      |FROM a ORDER BY n_click""".stripMargin

  // ───────── per-group linear fit via the regr_* surface ─────────

  /** Per-returnflag ordinary-least-squares fit of extended price on
    * quantity through the ANSI `regr_*` aggregate surface — slope,
    * intercept, R², and the pair count, the "is this relationship
    * stable across segments?" profile. Both engines implement regr_*
    * as mergeable co-moment aggregates (the corr/var_samp stability
    * class, round(4) per precedent); DuckDB's regr_count returns
    * DOUBLE and is cast back to BIGINT oracle-side. Scale: one
    * partial-aggregable pass, 3 output rows.
    */
  def qStatsRegr(spark: SparkSession, sfDir: String): DataFrame =
    Tables.t(spark, sfDir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        expr("regr_count(l_extendedprice, l_quantity)").as("n"),
        round(expr("regr_slope(l_extendedprice, l_quantity)"), 4)
          .as("slope"),
        round(expr("regr_intercept(l_extendedprice, l_quantity)"), 4)
          .as("icept"),
        round(expr("regr_r2(l_extendedprice, l_quantity)"), 4).as("r2"))
      .orderBy("l_returnflag")

  val qStatsRegrSql: String =
    """SELECT l_returnflag,
      |  CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
      |  round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
      |  round(regr_intercept(l_extendedprice, l_quantity), 4) AS icept,
      |  round(regr_r2(l_extendedprice, l_quantity), 4) AS r2
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ───────── 7-day rolling click↔purchase correlation ─────────

  /** 7-day rolling Pearson correlation between the daily click and
    * purchase counts — "are the two streams moving together this
    * week?", the windowed companion to the global q_corr_stats. All
    * window accumulations are EXACT BIGINTs over the bounded per-day
    * grid (the qGiniUsers histogram discipline — the window never sees
    * the event stream): n·Σxy − ΣxΣy and both variance terms are
    * integer; one sqrt + one division close each row, guarded by an
    * exact integer positivity test so a zero-variance week is NULL on
    * both engines (never a NaN/Inf fork). Scale: one count pass + a
    * |days|-row window.
    */
  def qEvtRollingCorr(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy(expr("unix_micros(ts) div 86400000000").as("dayn"))
      .agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("x"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("y"))
    val w = Window.orderBy("dayn").rowsBetween(-6, 0)
    d.withColumn("wn", count(lit(1)).over(w))
      .withColumn("sx", sum("x").over(w))
      .withColumn("sy", sum("y").over(w))
      .withColumn("sxx", sum(col("x") * col("x")).over(w))
      .withColumn("syy", sum(col("y") * col("y")).over(w))
      .withColumn("sxy", sum(col("x") * col("y")).over(w))
      .filter(col("wn") === 7)
      .withColumn("num", col("wn") * col("sxy") - col("sx") * col("sy"))
      .withColumn("dx", col("wn") * col("sxx") - col("sx") * col("sx"))
      .withColumn("dy", col("wn") * col("syy") - col("sy") * col("sy"))
      .select(col("dayn"), col("x").as("n_click"), col("y").as("n_purchase"),
        when(col("dx") > 0L && col("dy") > 0L,
          round(col("num").cast("double") /
            sqrt(col("dx").cast("double") * col("dy").cast("double")), 4))
          .as("roll_corr"))
      .orderBy("dayn")
  }

  val qEvtRollingCorrSql: String =
    """WITH d AS (SELECT
      |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS dayn,
      |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x,
      |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
      |  FROM events WHERE event_type IN ('click', 'purchase')
      |  GROUP BY 1),
      |w AS (SELECT dayn, x, y,
      |    count(*) OVER win AS wn,
      |    sum(x) OVER win AS sx, sum(y) OVER win AS sy,
      |    sum(x * x) OVER win AS sxx, sum(y * y) OVER win AS syy,
      |    sum(x * y) OVER win AS sxy
      |  FROM d
      |  WINDOW win AS (ORDER BY dayn ROWS BETWEEN 6 PRECEDING
      |    AND CURRENT ROW))
      |SELECT dayn, CAST(x AS BIGINT) AS n_click,
      |  CAST(y AS BIGINT) AS n_purchase,
      |  CASE WHEN wn * sxx - sx * sx > 0 AND wn * syy - sy * sy > 0
      |    THEN round((wn * sxy - sx * sy) /
      |      sqrt(CAST(wn * sxx - sx * sx AS DOUBLE)
      |        * CAST(wn * syy - sy * sy AS DOUBLE)), 4)
      |  END AS roll_corr
      |FROM w WHERE wn = 7 ORDER BY dayn""".stripMargin

  // ───────── Kruskal–Wallis k-group rank test ─────────

  /** Kruskal–Wallis H across ALL FIVE event types' `value`
    * distributions — the k-group generalization of
    * [[PipelineAudit.qStatsMannWhitney]], sharing its bounded-grid rank
    * discipline: per-value counts on the round(2) grid, cumulative
    * counts by window over GRID POINTS (never a corpus sort), doubled
    * tie-averaged rank sums 2Rⱼ = Σ cⱼ(2·cum + c + 1) as exact
    * DECIMAL(38,0), and the standard tie correction
    * 1 − Σ(c³−c)/(N³−N). H and its tie-corrected form take a handful
    * of divisions at the end over the five exact rank sums. Scale: one
    * narrow pass + one bounded-grid window.
    */
  def qStatsKruskal(spark: SparkSession, sfDir: String): DataFrame = {
    val types = Seq("click", "signup", "error", "view", "purchase")
    val ev = Tables.t(spark, sfDir, "events")
      .select(round(col("value"), 2).as("v"), col("event_type"))
    val gridAggs = types.map(t =>
      sum(when(col("event_type") === t, 1L).otherwise(0L))
        .as(s"c_$t")) :+ count(lit(1)).as("c")
    val grid = ev.groupBy("v").agg(gridAggs.head, gridAggs.tail: _*)
    val before = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = grid.withColumn("cum", coalesce(sum("c").over(before), lit(0L)))
    val aggCols = types.flatMap(t => Seq(
      sum(col(s"c_$t")).as(s"n_$t"),
      sum(col(s"c_$t").cast("decimal(19,0)") *
        (lit(2L) * col("cum") + col("c") + 1L)).as(s"r2_$t"))) ++ Seq(
      sum("c").as("nn"),
      sum(col("c").cast("decimal(12,0)") * col("c") * col("c") - col("c"))
        .as("ties"))
    val aggd = cum.agg(aggCols.head, aggCols.tail: _*)
    // Σ Rⱼ²/nⱼ with Rⱼ = r2ⱼ/2, entered as exact-decimal→double terms
    val sumR2 = types.map(t =>
      pow(col(s"r2_$t").cast("double") / 2.0, 2) /
        col(s"n_$t").cast("double")).reduce(_ + _)
    aggd
      .withColumn("h",
        lit(12.0) / (col("nn").cast("double") * (col("nn") + 1L)) * sumR2
          - lit(3.0) * (col("nn").cast("double") + 1.0))
      .withColumn("tiec",
        lit(1.0) - col("ties").cast("double") /
          (col("nn").cast("decimal(19,0)") * col("nn") * col("nn") -
            col("nn")).cast("double"))
      .select(col("nn").as("n"), lit(4L).as("df"),
        round(col("h"), 4).as("h_stat"),
        round(col("h") / col("tiec"), 4).as("h_tie_corrected"))
  }

  val qStatsKruskalSql: String =
    """WITH ev AS (SELECT round(value, 2) AS v, event_type FROM events),
      |grid AS (SELECT v,
      |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c_click,
      |    sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS c_signup,
      |    sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS c_error,
      |    sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS c_view,
      |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS c_purchase,
      |    count(*) AS c
      |  FROM ev GROUP BY v),
      |w AS (SELECT *, coalesce(sum(c) OVER (ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
      |  FROM grid),
      |a AS (SELECT
      |    sum(c_click) AS n_click,
      |    sum(c_click * (2 * cum + c + 1)) AS r2_click,
      |    sum(c_signup) AS n_signup,
      |    sum(c_signup * (2 * cum + c + 1)) AS r2_signup,
      |    sum(c_error) AS n_error,
      |    sum(c_error * (2 * cum + c + 1)) AS r2_error,
      |    sum(c_view) AS n_view,
      |    sum(c_view * (2 * cum + c + 1)) AS r2_view,
      |    sum(c_purchase) AS n_purchase,
      |    sum(c_purchase * (2 * cum + c + 1)) AS r2_purchase,
      |    sum(c) AS nn,
      |    sum(CAST(c AS HUGEINT) * c * c - c) AS ties
      |  FROM w),
      |h AS (SELECT nn, ties,
      |    12.0 / (CAST(nn AS DOUBLE) * (nn + 1)) * (
      |      pow(CAST(r2_click AS DOUBLE) / 2.0, 2) / CAST(n_click AS DOUBLE)
      |      + pow(CAST(r2_signup AS DOUBLE) / 2.0, 2)
      |        / CAST(n_signup AS DOUBLE)
      |      + pow(CAST(r2_error AS DOUBLE) / 2.0, 2)
      |        / CAST(n_error AS DOUBLE)
      |      + pow(CAST(r2_view AS DOUBLE) / 2.0, 2) / CAST(n_view AS DOUBLE)
      |      + pow(CAST(r2_purchase AS DOUBLE) / 2.0, 2)
      |        / CAST(n_purchase AS DOUBLE))
      |    - 3.0 * (CAST(nn AS DOUBLE) + 1.0) AS h
      |  FROM a)
      |SELECT CAST(nn AS BIGINT) AS n, CAST(4 AS BIGINT) AS df,
      |  round(h, 4) AS h_stat,
      |  round(h / (1.0 - CAST(ties AS DOUBLE)
      |    / CAST(nn * nn * nn - nn AS DOUBLE)), 4) AS h_tie_corrected
      |FROM h ORDER BY n""".stripMargin

  // ───────── deterministic differential-privacy counts ─────────

  /** ε-differential-privacy Laplace mechanism over the per-type event
    * counts, with the noise draw made DETERMINISTIC the house way
    * (q_split_train convention): the uniform u ∈ (0,1) comes from the
    * group key's 60-bit content hash, and the Laplace quantile
    * −(1/ε)·sign(u−½)·ln(1−2|u−½|) is one ln over an exact rational —
    * bit-identical input on both engines, round(2) output. True counts
    * ship alongside for the calibration check (this is the operator
    * test surface, not a release view). Scale: a pure
    * partial-aggregable count + per-group scalar math.
    */
  def qDpCount(spark: SparkSession, sfDir: String): DataFrame = {
    val eps = 0.1
    Tables.t(spark, sfDir, "events")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"))
      .withColumn("u",
        ((Tables.md5Bucket(col("event_type")) % 1000000L)
          .cast("double") + 0.5) / 1000000.0)
      .select(col("event_type"), col("n"),
        round(col("n") +
          lit(-1.0 / eps) * signum(col("u") - 0.5) *
            log(lit(1.0) - lit(2.0) * abs(col("u") - 0.5)), 2)
          .as("noisy_n"),
        lit(eps).as("epsilon"))
      .orderBy("event_type")
  }

  val qDpCountSql: String =
    """WITH a AS (SELECT event_type, count(*) AS n,
      |    (CAST(('0x' || substring(md5(event_type), 1, 15)) AS BIGINT)
      |      % 1000000 + 0.5) / 1000000.0 AS u
      |  FROM events GROUP BY event_type)
      |SELECT event_type, n,
      |  round(n + (-10.0) * sign(u - 0.5) * ln(1.0 - 2.0 * abs(u - 0.5)), 2)
      |    AS noisy_n,
      |  CAST(0.1 AS DOUBLE) AS epsilon
      |FROM a ORDER BY event_type""".stripMargin

  // ───────── Cronbach's alpha over the embedding dimensions ─────────

  /** Cronbach's α treating the 64 embedding dimensions as test items —
    * the internal-consistency audit ("do the dimensions co-measure one
    * construct?") that flags a representation whose total variance is
    * just the sum of independent per-dim noise (α ≈ 0). Both variance
    * passes run over the SAME exploded (vec, dim) relation: per-dim
    * var_samp (64 bounded rows) and the per-vector row-total variance —
    * all mergeable moments of the q_corr_stats stability class;
    * α = k/(k−1)·(1 − Σvarⱼ/var_total) closes in one expression. Scale:
    * one explode pass, two partial aggregates, 1 output row.
    */
  def qStatsCronbach(spark: SparkSession, sfDir: String): DataFrame = {
    val x = Tables.t(spark, sfDir, "embeddings")
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("p", "xv")))
      .select(col("vec_id"), col("p"), col("xv").cast("double").as("x"))
    val item = x.groupBy("p").agg(expr("var_samp(x)").as("vj"))
    val tot = x.groupBy("vec_id").agg(sum("x").as("s"))
      .agg(expr("var_samp(s)").as("vt"))
    item.agg(count(lit(1)).as("k"), sum("vj").as("sv"))
      .crossJoin(broadcast(tot))
      .select(col("k"),
        round((col("k") / (col("k") - lit(1.0))) *
          (lit(1.0) - col("sv") / col("vt")), 4).as("alpha"),
        round(col("sv"), 4).as("sum_item_var"),
        round(col("vt"), 4).as("total_var"))
  }

  val qStatsCronbachSql: String =
    """WITH x AS (SELECT vec_id, i AS p,
      |    CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) AS x
      |  FROM embeddings, unnest(generate_series(1, 64)) t(i)),
      |item AS (SELECT p, var_samp(x) AS vj FROM x GROUP BY p),
      |tot AS (SELECT var_samp(s) AS vt
      |  FROM (SELECT vec_id, sum(x) AS s FROM x GROUP BY vec_id)),
      |a AS (SELECT count(*) AS k, sum(vj) AS sv FROM item)
      |SELECT k,
      |  round((k / (k - 1.0)) * (1.0 - sv / vt), 4) AS alpha,
      |  round(sv, 4) AS sum_item_var, round(vt, 4) AS total_var
      |FROM a, tot ORDER BY k""".stripMargin

  // ───────── A/B-test minimum-detectable-effect planner ─────────

  /** Minimum detectable effect per event type — the experiment-design
    * planner: with this type's sample size and variance, the smallest
    * mean shift a two-sample test resolves at α = 0.05 / power = 0.8
    * against an equal-sized arm, MDE = (z₀.₉₇₅ + z₀.₈)·√(2σ²/n), plus
    * the relative effect vs the current mean. The z-sum ships as ONE
    * shared 6-decimal literal (2.801585) so neither engine evaluates an
    * inverse normal; everything else is a single conditional-moment
    * pass (Welch stability class) closed by one sqrt per group.
    */
  def qAbtestMde(spark: SparkSession, sfDir: String): DataFrame =
    Tables.t(spark, sfDir, "events")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), avg("value").as("m"),
        expr("var_samp(value)").as("v"))
      .select(col("event_type"), col("n"),
        round(sqrt(col("v")), 4).as("sd"),
        round(lit(2.801585) * sqrt(lit(2.0) * col("v") / col("n")), 4)
          .as("mde"),
        round(lit(2.801585) * sqrt(lit(2.0) * col("v") / col("n"))
          / col("m"), 6).as("mde_rel"))
      .orderBy("event_type")

  val qAbtestMdeSql: String =
    """WITH a AS (SELECT event_type, count(*) AS n, avg(value) AS m,
      |    var_samp(value) AS v
      |  FROM events GROUP BY event_type)
      |SELECT event_type, n, round(sqrt(v), 4) AS sd,
      |  round(2.801585 * sqrt(2.0 * v / n), 4) AS mde,
      |  round(2.801585 * sqrt(2.0 * v / n) / m, 6) AS mde_rel
      |FROM a ORDER BY event_type""".stripMargin
}

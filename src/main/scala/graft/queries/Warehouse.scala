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
    */
  def qUpsertLatest(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.t(spark, sfDir, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val base = orders.withColumn("version", lit(1))
    val upd = orders.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 100)
      .withColumn("version", lit(2))
    val w = Window.partitionBy("o_orderkey").orderBy(desc("version"))
    base.unionByName(upd)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        round(sum("o_totalprice"), 4).as("total"))
      .orderBy("o_orderstatus")
  }

  val qUpsertLatestSql: String =
    """WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice,
      |    1 AS version FROM orders),
      |upd AS (SELECT o_orderkey, o_orderstatus, o_totalprice + 100,
      |    2 AS version FROM orders WHERE o_orderkey % 10 = 0),
      |u AS (SELECT * FROM base UNION ALL SELECT * FROM upd),
      |m AS (SELECT *, row_number() OVER (PARTITION BY o_orderkey
      |    ORDER BY version DESC) AS rn FROM u)
      |SELECT o_orderstatus, count(*) AS n,
      |  round(sum(o_totalprice), 4) AS total
      |FROM m WHERE rn = 1
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** SCD type-2 interval building from the event stream: every change
    * of a user's event_type closes the previous state row and opens a
    * new one with [valid_from, valid_to) bounds (valid_to NULL = the
    * current state). lag detects the change, the running change-count
    * is the interval id, lead supplies the closing bound — all windows
    * partitioned by user.
    */
  def qScd2(spark: SparkSession, sfDir: String): DataFrame = {
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
      .select("user_id", "state", "valid_from", "valid_to", "n_events")
      .orderBy("user_id", "valid_from")
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
      |FROM iv ORDER BY user_id, valid_from""".stripMargin
}

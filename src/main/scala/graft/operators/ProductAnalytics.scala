package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.sources.Tables

/** Product / behavioral analytics over the event stream (SURVEY §2
  * C35–C38) — the funnel, transition, retention, and profiling shapes
  * a dashboard suite builds on top of the raw log store.
  */
object ProductAnalytics {

  /** C54 — frequent_item_sets (the OpenSearch ML association-rules
    * agg: which event types co-occur in the same user's behavior).
    * Baskets = distinct (user, type) — one aggregate collapses the
    * fact table to user×type cardinality; the pair self-join is
    * user-keyed (co-located in one exchange) with `t1 < t2` halving
    * the pair space; support is a RATIO (cnt·10 ≥ users·3, integer
    * cross-multiplied) so the threshold is scale-stable where a fixed
    * count thins to nothing or everything.
    */
  def frequentItemSets(spark: SparkSession, dir: String): DataFrame = {
    val baskets = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type")).distinct()
    val nUsers = baskets.select(col("user_id")).distinct()
      .agg(count(lit(1)).as("n_users"))
    val b2 = baskets.select(col("user_id"), col("event_type").as("t2"))
    baskets.join(b2, Seq("user_id"))
      .filter(col("event_type") < col("t2"))
      .groupBy(col("event_type").as("t1"), col("t2"))
      .agg(count(lit(1)).as("support_cnt"))
      .crossJoin(broadcast(nUsers))
      .filter(col("support_cnt") * 10 >= col("n_users") * 3)
      .select(col("t1"), col("t2"), col("support_cnt"),
        (col("support_cnt").cast("double") / col("n_users")).as("support"))
      .orderBy(col("support_cnt").desc, col("t1"), col("t2"))
  }

  val frequentItemSetsSql: String =
    """WITH baskets AS (SELECT DISTINCT user_id, event_type FROM events),
      |nu AS (SELECT count(DISTINCT user_id) AS n_users FROM baskets),
      |pairs AS (
      |  SELECT a.event_type AS t1, b.event_type AS t2, count(*) AS support_cnt
      |  FROM baskets a JOIN baskets b
      |    ON a.user_id = b.user_id AND a.event_type < b.event_type
      |  GROUP BY 1, 2)
      |SELECT t1, t2, support_cnt,
      |  CAST(support_cnt AS DOUBLE) / n_users AS support
      |FROM pairs CROSS JOIN nu
      |WHERE support_cnt * 10 >= n_users * 3
      |ORDER BY support_cnt DESC, t1, t2""".stripMargin

  /** C35 — ordered funnel: view → click-after-view →
    * purchase-after-that-click, counted per step. Each step is an
    * aggregate on user_id joined to the next event slice — three
    * shuffles on the same key (co-partitioned after the first), no
    * window sort over the full stream.
    */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), date_trunc("second", col("ts")).as("tss"))
    val t1 = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("tss")).as("t1"))
    val t2 = e.filter(col("event_type") === "click")
      .join(t1, "user_id").filter(col("tss") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("tss")).as("t2"))
    val t3 = e.filter(col("event_type") === "purchase")
      .join(t2, "user_id").filter(col("tss") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("tss")).as("t3"))
    val n1 = t1.agg(count(lit(1)).as("n")).select(lit(1L).as("step"), lit("view").as("event"), col("n"))
    val n2 = t2.agg(count(lit(1)).as("n")).select(lit(2L).as("step"), lit("click_after_view").as("event"), col("n"))
    val n3 = t3.agg(count(lit(1)).as("n")).select(lit(3L).as("step"), lit("purchase_after_click").as("event"), col("n"))
    n1.unionByName(n2).unionByName(n3).orderBy(col("step"))
  }

  val funnelSql: String =
    """WITH e AS (
      |  SELECT user_id, event_type, date_trunc('second', ts) AS tss FROM events),
      |t1 AS (SELECT user_id, min(tss) AS t1 FROM e WHERE event_type = 'view' GROUP BY user_id),
      |t2 AS (SELECT e.user_id, min(tss) AS t2 FROM e JOIN t1 USING (user_id)
      |       WHERE event_type = 'click' AND tss > t1 GROUP BY e.user_id),
      |t3 AS (SELECT e.user_id, min(tss) AS t3 FROM e JOIN t2 USING (user_id)
      |       WHERE event_type = 'purchase' AND tss > t2 GROUP BY e.user_id)
      |SELECT CAST(1 AS BIGINT) AS step, 'view' AS event, count(*) AS n FROM t1
      |UNION ALL
      |SELECT CAST(2 AS BIGINT) AS step, 'click_after_view' AS event, count(*) AS n FROM t2
      |UNION ALL
      |SELECT CAST(3 AS BIGINT) AS step, 'purchase_after_click' AS event, count(*) AS n FROM t3
      |ORDER BY step""".stripMargin

  /** C35b — conversion-window funnel (C35 with the constraint real
    * funnels always carry: each step must follow the previous WITHIN a
    * window — a purchase three weeks after the click is not that
    * click's conversion). Same decorrelated min-time chain as C35,
    * with the window bound as one more join-filter conjunct — the
    * per-step joins stay user-keyed in one exchange lineage; nothing
    * new shuffles.
    */
  def funnelWindowed(spark: SparkSession, dir: String, days: Int = 7): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), date_trunc("second", col("ts")).as("tss"))
    val bound = expr(s"INTERVAL $days DAYS")
    val t1 = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("tss")).as("t1"))
    val t2 = e.filter(col("event_type") === "click")
      .join(t1, "user_id")
      .filter(col("tss") > col("t1") && col("tss") <= col("t1") + bound)
      .groupBy(col("user_id")).agg(min(col("tss")).as("t2"))
    val t3 = e.filter(col("event_type") === "purchase")
      .join(t2, "user_id")
      .filter(col("tss") > col("t2") && col("tss") <= col("t2") + bound)
      .groupBy(col("user_id")).agg(min(col("tss")).as("t3"))
    val n1 = t1.agg(count(lit(1)).as("n")).select(lit(1L).as("step"), lit("view").as("event"), col("n"))
    val n2 = t2.agg(count(lit(1)).as("n")).select(lit(2L).as("step"), lit("click_within_7d").as("event"), col("n"))
    val n3 = t3.agg(count(lit(1)).as("n")).select(lit(3L).as("step"), lit("purchase_within_7d").as("event"), col("n"))
    n1.unionByName(n2).unionByName(n3).orderBy(col("step"))
  }

  val funnelWindowedSql: String =
    """WITH e AS (
      |  SELECT user_id, event_type, date_trunc('second', ts) AS tss FROM events),
      |t1 AS (SELECT user_id, min(tss) AS t1 FROM e WHERE event_type = 'view' GROUP BY user_id),
      |t2 AS (SELECT e.user_id, min(tss) AS t2 FROM e JOIN t1 USING (user_id)
      |       WHERE event_type = 'click' AND tss > t1 AND tss <= t1 + INTERVAL 7 DAY
      |       GROUP BY e.user_id),
      |t3 AS (SELECT e.user_id, min(tss) AS t3 FROM e JOIN t2 USING (user_id)
      |       WHERE event_type = 'purchase' AND tss > t2 AND tss <= t2 + INTERVAL 7 DAY
      |       GROUP BY e.user_id)
      |SELECT CAST(1 AS BIGINT) AS step, 'view' AS event, count(*) AS n FROM t1
      |UNION ALL
      |SELECT CAST(2 AS BIGINT) AS step, 'click_within_7d' AS event, count(*) AS n FROM t2
      |UNION ALL
      |SELECT CAST(3 AS BIGINT) AS step, 'purchase_within_7d' AS event, count(*) AS n FROM t3
      |ORDER BY step""".stripMargin

  /** C36 — event-type transition matrix (Markov counts): consecutive
    * event pairs per user timeline, one lag window per user partition
    * with a unique tiebreak.
    */
  def transitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("tss"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        date_trunc("second", col("ts")).as("tss"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("prev_type"), col("next_type"))
  }

  val transitionsSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, date_trunc('second', ts) AS tss FROM events),
      |l AS (
      |  SELECT event_type,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY tss, event_id) AS prev_type
      |  FROM e)
      |SELECT prev_type, event_type AS next_type, count(*) AS n
      |FROM l WHERE prev_type IS NOT NULL
      |GROUP BY prev_type, next_type
      |ORDER BY prev_type, next_type""".stripMargin

  /** C37 — retention curve: for each day-offset since a user's first
    * activity, how many users were active. First-seen day is one
    * aggregate, broadcast back over the activity stream.
    */
  def retention(spark: SparkSession, dir: String): DataFrame = {
    val act = Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .distinct()
    val first = act.groupBy(col("user_id")).agg(min(col("day")).as("day0"))
    act.join(broadcast(first), "user_id")
      .groupBy(datediff(col("day"), col("day0")).cast("long").as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("day_offset"))
  }

  val retentionSql: String =
    """WITH act AS (
      |  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
      |first AS (
      |  SELECT user_id, min(day) AS day0 FROM act GROUP BY user_id)
      |SELECT CAST(datediff('day', day0, day) AS BIGINT) AS day_offset,
      |  count(DISTINCT user_id) AS n_users
      |FROM act JOIN first USING (user_id)
      |GROUP BY 1
      |ORDER BY day_offset""".stripMargin

  /** C39 — seasonality heatmap: event volume by (day-of-week, hour) —
    * the dashboard "when does traffic happen" matrix. Day-of-week
    * conventions differ across engines (Spark: 1=Sunday; DuckDB
    * date_part('dow'): 0=Sunday), so both sides normalize to 0=Sunday
    * explicitly.
    */
  def seasonality(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(
        (dayofweek(col("ts")) - 1).cast("long").as("dow"),
        hour(col("ts")).cast("long").as("hour"))
      .agg(count(lit(1)).as("n"), round(avg(col("value")), 4).as("avg_value"))
      .orderBy(col("dow"), col("hour"))

  val seasonalitySql: String =
    """SELECT CAST(date_part('dow', ts) AS BIGINT) AS dow,
      |  CAST(date_part('hour', ts) AS BIGINT) AS hour,
      |  count(*) AS n, round(avg(value), 4) AS avg_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY dow, hour""".stripMargin

  /** C38 — data profiling: per-table completeness/cardinality summary
    * (the "what's in this dataset" pass a pipeline runs before
    * training). One scan, one row out.
    */
  def profile(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("user_id")).as("n_user_id"),
        countDistinct(col("user_id")).as("d_user_id"),
        countDistinct(col("event_type")).as("d_event_type"),
        round(min(col("value")), 4).as("min_value"),
        round(max(col("value")), 4).as("max_value"),
        round(avg(length(col("props"))), 4).as("avg_props_len"))

  val profileSql: String =
    """SELECT count(*) AS n_rows,
      |  count(user_id) AS n_user_id,
      |  count(DISTINCT user_id) AS d_user_id,
      |  count(DISTINCT event_type) AS d_event_type,
      |  round(min(value), 4) AS min_value,
      |  round(max(value), 4) AS max_value,
      |  round(avg(length(props)), 4) AS avg_props_len
      |FROM events""".stripMargin
}

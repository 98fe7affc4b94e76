package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Remaining OpenSearch metric-aggregation family members (SURVEY §2
  * C5d–C5g): weighted_avg, boxplot, t_test, rate. All one- or two-pass
  * conditional/percentile aggregates — map-side combined, one tiny
  * shuffle, no windows — so each streams at any scale.
  */
object Stats {

  /** C5d — weighted_avg (OpenSearch `weighted_avg` agg): Σ(v·w)/Σ(w)
    * per group, with a deterministic per-row sample weight. One
    * map-side-combined aggregate.
    */
  def weightedAvg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("w", (col("user_id") % 5 + 1).cast("double"))
      .groupBy(col("event_type"))
      .agg(
        round(sum(col("value") * col("w")) / sum(col("w")), 4).as("wavg"),
        round(avg(col("value")), 4).as("avg"))
      .orderBy(col("event_type"))

  val weightedAvgSql: String =
    """SELECT event_type,
      |  round(sum(value * CAST(user_id % 5 + 1 AS DOUBLE))
      |        / sum(CAST(user_id % 5 + 1 AS DOUBLE)), 4) AS wavg,
      |  round(avg(value), 4) AS avg
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** C5e — boxplot (OpenSearch `boxplot` agg): min/q1/median/q3/max +
    * IQR per group. Exact linear-interpolation percentiles (the same
    * parity as C5) in ONE aggregate pass.
    */
  def boxplot(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        round(min(col("value")), 4).as("vmin"),
        round(expr("percentile(value, 0.25)"), 4).as("q1"),
        round(expr("percentile(value, 0.5)"), 4).as("q2"),
        round(expr("percentile(value, 0.75)"), 4).as("q3"),
        round(max(col("value")), 4).as("vmax"),
        round(expr("percentile(value, 0.75) - percentile(value, 0.25)"), 4).as("iqr"))
      .orderBy(col("event_type"))

  val boxplotSql: String =
    """SELECT event_type,
      |  round(min(value), 4) AS vmin,
      |  round(quantile_cont(value, 0.25), 4) AS q1,
      |  round(quantile_cont(value, 0.5), 4) AS q2,
      |  round(quantile_cont(value, 0.75), 4) AS q3,
      |  round(max(value), 4) AS vmax,
      |  round(quantile_cont(value, 0.75) - quantile_cont(value, 0.25), 4) AS iqr
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** C5f — t_test (OpenSearch `t_test` agg, Welch's unpaired variant):
    * does the `purchase` cohort's value differ from the `error`
    * cohort's? Closed form from per-cohort (n, mean, sample variance) —
    * one conditional-aggregate pass, one output row; the
    * Welch–Satterthwaite degrees of freedom come from the same four
    * sufficient statistics.
    */
  def tTest(spark: SparkSession, dir: String,
            cohortA: String = "purchase", cohortB: String = "error"): DataFrame = {
    val stats = Tables.events(spark, dir)
      .filter(col("event_type").isin(cohortA, cohortB))
      .groupBy()
      .agg(
        count(when(col("event_type") === cohortA, 1)).cast("double").as("n1"),
        avg(when(col("event_type") === cohortA, col("value"))).as("m1"),
        var_samp(when(col("event_type") === cohortA, col("value"))).as("v1"),
        count(when(col("event_type") === cohortB, 1)).cast("double").as("n2"),
        avg(when(col("event_type") === cohortB, col("value"))).as("m2"),
        var_samp(when(col("event_type") === cohortB, col("value"))).as("v2"))
    val se2 = col("v1") / col("n1") + col("v2") / col("n2")
    stats.select(
      col("n1").cast("long").as("n1"),
      col("n2").cast("long").as("n2"),
      round((col("m1") - col("m2")) / sqrt(se2), 4).as("t"),
      round(se2 * se2 /
        (col("v1") * col("v1") / (col("n1") * col("n1") * (col("n1") - 1)) +
         col("v2") * col("v2") / (col("n2") * col("n2") * (col("n2") - 1))), 4).as("df"))
  }

  val tTestSql: String =
    """WITH s AS (
      |  SELECT
      |    CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS DOUBLE) AS n1,
      |    avg(CASE WHEN event_type = 'purchase' THEN value END) AS m1,
      |    var_samp(CASE WHEN event_type = 'purchase' THEN value END) AS v1,
      |    CAST(count(CASE WHEN event_type = 'error' THEN 1 END) AS DOUBLE) AS n2,
      |    avg(CASE WHEN event_type = 'error' THEN value END) AS m2,
      |    var_samp(CASE WHEN event_type = 'error' THEN value END) AS v2
      |  FROM events WHERE event_type IN ('purchase', 'error'))
      |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
      |  round((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 4) AS t,
      |  round((v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2) /
      |        (v1 * v1 / (n1 * n1 * (n1 - 1)) + v2 * v2 / (n2 * n2 * (n2 - 1))), 4) AS df
      |FROM s""".stripMargin

  /** C5g — rate (OpenSearch `rate` agg): events per day per group,
    * normalized by the group's own active day span (first to last day
    * inclusive). One aggregate pass; the span comes from the same
    * min/max the group already computes.
    */
  def rate(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        (datediff(max(to_date(col("ts"))), min(to_date(col("ts")))) + 1)
          .cast("long").as("days"))
      .select(col("event_type"), col("n"), col("days"),
        round(col("n").cast("double") / col("days"), 4).as("per_day"))
      .orderBy(col("event_type"))

  val rateSql: String =
    """SELECT event_type, count(*) AS n,
      |  CAST(date_diff('day', min(CAST(ts AS DATE)), max(CAST(ts AS DATE))) + 1 AS BIGINT) AS days,
      |  round(CAST(count(*) AS DOUBLE) /
      |        (date_diff('day', min(CAST(ts AS DATE)), max(CAST(ts AS DATE))) + 1), 4) AS per_day
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin
}

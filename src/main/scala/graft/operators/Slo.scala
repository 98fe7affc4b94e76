package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** SLO / burn-rate monitoring and change-detection operators (SURVEY §2
  * C4b, C68, C53b, C3q) — the alerting tier a unified-log user builds
  * on top of the reference's dashboards (reference: README's Discover
  * workflows; the OpenSearch alerting plugin's multi-timeframe monitors
  * are the upstream face of C4b).
  */
object Slo {

  /** C4b — multi-window SLO burn rate (the Google SRE workbook's
    * multiple-burn-rate alerts, the standard follow-on to C4's raw
    * error rate): burn = (observed error rate / error budget) per
    * trailing window, alert tiers pair a long and a short window so
    * pages need BOTH a sustained and a current burn. One scan computes
    * every window via conditional aggregation against the series end
    * ("now" = max ts, a one-row broadcast — deterministic replay, no
    * wall clock); integer counts, one double division per window,
    * stack-unpivot to a row per window.
    */
  def burnRate(spark: SparkSession, dir: String,
               budget: Double = 0.25): DataFrame = {
    val windows = Seq(("1h", "1 HOUR"), ("6h", "6 HOUR"), ("1d", "1 DAY"), ("7d", "7 DAY"))
    val ev = Tables.events(spark, dir)
    val now = ev.agg(max(col("ts")).as("now_ts"))
    val inW: String => Column = iv => col("ts") > expr(s"now_ts - INTERVAL $iv")
    val aggs = windows.flatMap { case (lbl, iv) =>
      Seq(sum(when(inW(iv), 1L).otherwise(0L)).as(s"total_$lbl"),
        sum(when(inW(iv) && col("event_type") === "error", 1L).otherwise(0L)).as(s"errors_$lbl"))
    }
    val wide = ev.crossJoin(broadcast(now)).agg(aggs.head, aggs.tail: _*)
    val stackArgs = windows.flatMap { case (lbl, _) =>
      Seq(lit(lbl), col(s"total_$lbl"), col(s"errors_$lbl"))
    }
    wide.select(expr(s"stack(${windows.size}, ${
      windows.map { case (lbl, _) => s"'$lbl', total_$lbl, errors_$lbl" }.mkString(", ")
    }) AS (win, total, errors)"))
      .select(col("win"), col("total"), col("errors"),
        // Gate page/ticket on the UNROUNDED ratio (mirroring burnRateSql);
        // round() is display-only — rounding first would page on a burn of
        // 1.1999996 that the oracle (and a real monitor) would not.
        when(col("total") > 0,
          col("errors").cast("double") / col("total") / lit(budget))
          .as("burn_raw"))
      .select(col("win"), col("total"), col("errors"),
        round(col("burn_raw"), 6).as("burn_rate"),
        coalesce(col("burn_raw") >= 1.2, lit(false)).as("page"),
        coalesce(col("burn_raw") >= 1.05, lit(false)).as("ticket"))
      .orderBy(col("win"))
  }

  val burnRateSql: String = {
    val windows = Seq(("1h", "1 HOUR"), ("6h", "6 HOUR"), ("1d", "1 DAY"), ("7d", "7 DAY"))
    val aggs = windows.map { case (lbl, iv) =>
      s"""SELECT '$lbl' AS win,
         |  CAST(sum(CASE WHEN ts > now_ts - INTERVAL $iv THEN 1 ELSE 0 END) AS BIGINT) AS total,
         |  CAST(sum(CASE WHEN ts > now_ts - INTERVAL $iv AND event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errors
         |FROM events CROSS JOIN n""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH n AS (SELECT max(ts) AS now_ts FROM events),
       |w AS (
       |  $aggs)
       |SELECT win, total, errors,
       |  CASE WHEN total > 0
       |       THEN round(CAST(errors AS DOUBLE) / total / 0.25, 6) END AS burn_rate,
       |  coalesce(CASE WHEN total > 0
       |       THEN CAST(errors AS DOUBLE) / total / 0.25 END >= 1.2, false) AS page,
       |  coalesce(CASE WHEN total > 0
       |       THEN CAST(errors AS DOUBLE) / total / 0.25 END >= 1.05, false) AS ticket
       |FROM w
       |ORDER BY win""".stripMargin
  }

  /** C68 — first-seen / new-value detection ("what error signatures
    * appeared TODAY that we have never seen?" — the OpenSearch
    * `rare_terms`-over-time / new-terms monitor). Signature here:
    * (event_type, props k-value). Two aggregates: min(first day) per
    * signature (signature-cardinality, not event-cardinality), then a
    * per-day rollup of active vs newborn signatures. A 100 TB run
    * shuffles once on the signature key and once on the day — both
    * map-side combined.
    */
  def firstSeen(spark: SparkSession, dir: String): DataFrame = {
    val sig = Tables.events(spark, dir)
      .select(date_trunc("day", col("ts")).as("day"),
        concat(col("event_type"), lit(":k"),
          regexp_extract(col("props"), "k\": ([0-9]+)", 1)).as("signature"))
    val firstDay = sig.groupBy(col("signature"))
      .agg(min(col("day")).as("first_day"))
    sig.distinct()
      .join(firstDay, "signature")
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("first_day") === col("day"), 1L).otherwise(0L)).as("n_new"),
        min(when(col("first_day") === col("day"), col("signature"))).as("example_new"))
      .orderBy(col("day"))
  }

  val firstSeenSql: String =
    """WITH sig AS (
      |  SELECT DISTINCT date_trunc('day', ts) AS day,
      |    concat(event_type, ':k', regexp_extract(props, 'k": ([0-9]+)', 1)) AS signature
      |  FROM events),
      |fd AS (
      |  SELECT signature, min(day) AS first_day FROM sig GROUP BY 1)
      |SELECT s.day, count(*) AS n_active,
      |  CAST(sum(CASE WHEN f.first_day = s.day THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
      |  min(CASE WHEN f.first_day = s.day THEN s.signature END) AS example_new
      |FROM sig s JOIN fd f ON s.signature = f.signature
      |GROUP BY s.day
      |ORDER BY day""".stripMargin

  /** C53b core — log-pattern DIFF between two time ranges (the triage
    * question after a deploy: which templates are NEW, which vanished,
    * which exploded). Generic over any (ts, template) frame: one
    * conditional aggregate per template, status from the zero sides,
    * after/before ratio for the changed ones.
    */
  def patternDiffDf(templates: DataFrame, splitTs: String): DataFrame =
    templates
      .groupBy(col("template"))
      .agg(
        sum(when(col("ts") < lit(splitTs).cast("timestamp"), 1L).otherwise(0L)).as("n_before"),
        sum(when(col("ts") >= lit(splitTs).cast("timestamp"), 1L).otherwise(0L)).as("n_after"))
      .withColumn("status",
        when(col("n_before") === 0, "NEW")
          .when(col("n_after") === 0, "GONE")
          .otherwise("BOTH"))
      .withColumn("after_before_ratio",
        when(col("n_before") > 0 && col("n_after") > 0,
          round(col("n_after").cast("double") / col("n_before"), 6)))
      .orderBy(col("template"))

  /** C53b — the diff over C53's error-log templates, split mid-series
    * (the "deploy" instant). Same deterministic template synthesis as
    * C53's oracle so both engines derive identical strings.
    */
  def patternDiff(spark: SparkSession, dir: String,
                  splitTs: String = "2024-01-16 00:00:00"): DataFrame =
    patternDiffDf(
      Tables.events(spark, dir).select(col("ts"),
        concat(lit("File does not exist: /var/www/"), col("event_type"),
          lit("/s"), col("event_id") % 3).as("template")),
      splitTs)

  val patternDiffSql: String =
    """WITH t AS (
      |  SELECT ts,
      |    concat('File does not exist: /var/www/', event_type, '/s',
      |           CAST(event_id % 3 AS VARCHAR)) AS template
      |  FROM events),
      |d AS (
      |  SELECT template,
      |    CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN 1 ELSE 0 END) AS BIGINT) AS n_before,
      |    CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00' THEN 1 ELSE 0 END) AS BIGINT) AS n_after
      |  FROM t GROUP BY 1)
      |SELECT template, n_before, n_after,
      |  CASE WHEN n_before = 0 THEN 'NEW'
      |       WHEN n_after = 0 THEN 'GONE' ELSE 'BOTH' END AS status,
      |  CASE WHEN n_before > 0 AND n_after > 0
      |       THEN round(CAST(n_after AS DOUBLE) / n_before, 6) END AS after_before_ratio
      |FROM d
      |ORDER BY template""".stripMargin

  /** C3q — `track_total_hits` (bounded hit counting: OpenSearch stops
    * counting at the cap and reports `gte` — counting ALL hits of a
    * broad query costs a full scan, which is why upstream defaults the
    * cap to 10k). Spark-native: `limit(cap)` under the count plants a
    * LocalLimit/CollectLimit — every task stops producing once the cap
    * is globally satisfiable, so a match-heavy query never pays a full
    * count. The cap arrives data-independent; the relation column says
    * which side of it the truth lies on.
    */
  def trackTotalHits(spark: SparkSession, dir: String, cap: Int = 1000): DataFrame = {
    import spark.implicits._
    val hits = Tables.events(spark, dir)
      .filter(col("event_type") === "view" && col("value") >= 10)
      .limit(cap)
      .count()
    Seq((hits, if (hits >= cap) "gte" else "eq")).toDF("hits", "relation")
  }

  val trackTotalHitsSql: String =
    """WITH c AS (
      |  SELECT count(*) AS full_n FROM events
      |  WHERE event_type = 'view' AND value >= 10)
      |SELECT least(full_n, 1000) AS hits,
      |  CASE WHEN full_n >= 1000 THEN 'gte' ELSE 'eq' END AS relation
      |FROM c""".stripMargin
}

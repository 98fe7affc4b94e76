package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Grok
import graft.sources.{LogLines, Tables}

/** Observability tier (SURVEY §2 C69–C71b): the grok ingest processor,
  * the ingest-pipeline `_simulate` chain, and Trace Analytics' two
  * flagship reads (service map, trace groups) — the OpenSearch
  * Observability features a unified-log user points at these same
  * indexes (reference: README's Discover/Dashboards workflows; trace
  * analytics is the sibling plugin of the log flow).
  *
  * All four are single-scan declarative plans: parse batteries are
  * codegen'd regexp projections, the trace reads are one or two
  * map-side-combined aggregates — nothing here shuffles more than its
  * grouping keys at 100 TB.
  */
object Observability {

  // ---- C69: grok processor ------------------------------------------

  /** Grok-parse the syslog app-log stream (the format no hand battery
    * covers). The grok expression compiles ONCE on the driver to a flat
    * regex + ordered captures (functions/Grok.scala); the plan is the
    * same scan-parallel regexp_extract projection as B1. The oracle
    * derives every expected field from the events columns directly —
    * parse verified without sharing a code path.
    */
  val syslogGrok: String =
    """<%{INT:pri:int}>%{TIMESTAMP_ISO8601:ts_iso} %{HOSTNAME:host} """ +
      """%{WORD:app}\[%{INT:pid:int}\]: level=%{LOGLEVEL:level} """ +
      """user=%{INT:user:int} took=%{NUMBER:took:float}ms %{WORD:verb} %{URIPATH:path}"""

  def grokParse(spark: SparkSession, dir: String): DataFrame =
    Grok.parse(LogLines.syslogLines(spark, dir), "line", syslogGrok)
      .select("event_id", "pri", "ts_iso", "host", "pid", "level", "user", "took", "verb", "path")
      .orderBy(col("event_id"))

  val grokParseSql: String =
    """SELECT event_id,
      |  CAST(128 + user_id % 8 AS BIGINT) AS pri,
      |  strftime(date_trunc('second', ts), '%Y-%m-%dT%H:%M:%SZ') AS ts_iso,
      |  concat('host-', user_id % 50) AS host,
      |  CAST(event_id % 1000 AS BIGINT) AS pid,
      |  CASE WHEN event_type = 'error' THEN 'ERROR'
      |       WHEN event_type = 'signup' THEN 'WARN' ELSE 'INFO' END AS level,
      |  CAST(user_id AS BIGINT) AS user,
      |  CAST(CAST(value AS DECIMAL(20,6)) AS DOUBLE) AS took,
      |  CASE WHEN event_type IN ('signup','purchase') THEN 'POST' ELSE 'GET' END AS verb,
      |  concat('/', event_type, '/', event_id % 100) AS path
      |FROM events
      |ORDER BY event_id""".stripMargin

  // ---- C70: ingest pipeline (_simulate) ------------------------------

  /** Ingest-pipeline processor vocabulary (the OpenSearch `_ingest`
    * pipeline definition re-expressed): each processor is a pure column
    * rewrite, so a whole pipeline FOLDS into one projection — Catalyst
    * collapses the chain and the scan still prunes/pushes. That is the
    * structural win over document-at-a-time ingest nodes: the pipeline
    * costs one codegen'd map over the scan, never a per-doc interpreter.
    */
  sealed trait Processor
  final case class SetP(field: String, value: Column) extends Processor
  final case class RenameP(from: String, to: String) extends Processor
  final case class ConvertP(field: String, to: String) extends Processor
  final case class GsubP(field: String, pattern: String, replacement: String) extends Processor
  final case class LowercaseP(field: String) extends Processor
  final case class UppercaseP(field: String) extends Processor
  final case class RemoveP(field: String) extends Processor

  def runPipeline(df: DataFrame, pipeline: Seq[Processor]): DataFrame =
    pipeline.foldLeft(df) { (d, p) =>
      p match {
        case SetP(f, v)        => d.withColumn(f, v)
        case RenameP(a, b)     => d.withColumnRenamed(a, b)
        case ConvertP(f, t)    => d.withColumn(f, col(f).cast(t))
        case GsubP(f, pat, r)  => d.withColumn(f, regexp_replace(col(f), pat, r))
        case LowercaseP(f)     => d.withColumn(f, lower(col(f)))
        case UppercaseP(f)     => d.withColumn(f, upper(col(f)))
        case RemoveP(f)        => d.drop(f)
      }
    }

  /** The `_simulate` query: a realistic enrichment pipeline over the
    * event stream — rename the JSON props, gsub it down to its numeric
    * payload, convert, uppercase the type, stamp the pipeline id and the
    * daily index route (the `logs-<type>-<yyyy.MM.dd>` naming the
    * reference's Firehose→index flow uses), drop the raw value.
    */
  def ingestPipeline(spark: SparkSession, dir: String): DataFrame = {
    val pipeline = Seq(
      RenameP("props", "attrs"),
      GsubP("attrs", "[^0-9]", ""),
      ConvertP("attrs", "long"),
      UppercaseP("event_type"),
      SetP("pipeline_id", lit("events-v2")),
      SetP("route", concat(lit("logs-"), lower(col("event_type")),
        lit("-"), date_format(col("ts"), "yyyy.MM.dd"))),
      RemoveP("value"))
    runPipeline(Tables.events(spark, dir), pipeline)
      .select("event_id", "event_type", "attrs", "pipeline_id", "route")
      .orderBy(col("event_id"))
  }

  val ingestPipelineSql: String =
    """SELECT event_id,
      |  upper(event_type) AS event_type,
      |  CAST(regexp_replace(props, '[^0-9]', '', 'g') AS BIGINT) AS attrs,
      |  'events-v2' AS pipeline_id,
      |  concat('logs-', event_type, '-', strftime(ts, '%Y.%m.%d')) AS route
      |FROM events
      |ORDER BY event_id""".stripMargin

  // ---- C71: trace analytics — service map ---------------------------

  private def srcSvc: Column =
    when(col("user_id") % 3 === 0, "web")
      .when(col("user_id") % 3 === 1, "mobile")
      .otherwise("api-gw")

  private def dstSvc: Column =
    when(col("event_type") === "view", "catalog")
      .when(col("event_type") === "click", "frontend")
      .when(col("event_type") === "signup", "auth")
      .when(col("event_type") === "purchase", "payment")
      // error spans split across two downstreams so error_rate varies by edge
      .otherwise(when(col("user_id") % 2 === 0, "payment").otherwise("catalog"))

  /** Service map: each event is a client→server span (service identity
    * derived deterministically so the oracle can re-derive it); edges
    * aggregate to call count, error count/rate, and latency stats —
    * the numbers on every OpenSearch service-map edge. ONE scan, one
    * map-side-combined aggregate on a tiny (src,dst) key space; at
    * 100 TB the exchange carries |edges| rows, not spans.
    */
  def serviceMap(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(srcSvc.as("src"), dstSvc.as("dst"),
        (col("event_type") === "error").cast("long").as("is_err"),
        floor(col("value") * 100).cast("long").as("latency_ms"))
      .groupBy(col("src"), col("dst"))
      .agg(
        count(lit(1)).as("calls"),
        sum(col("is_err")).as("errors"),
        round(sum(col("is_err")).cast("double") / count(lit(1)), 4).as("error_rate"),
        round(avg(col("latency_ms")), 2).as("avg_ms"),
        round(expr("percentile(latency_ms, 0.95)"), 2).as("p95_ms"))
      .orderBy(col("src"), col("dst"))

  val serviceMapSql: String =
    """WITH spans AS (
      |  SELECT
      |    CASE WHEN user_id % 3 = 0 THEN 'web'
      |         WHEN user_id % 3 = 1 THEN 'mobile' ELSE 'api-gw' END AS src,
      |    CASE WHEN event_type = 'view' THEN 'catalog'
      |         WHEN event_type = 'click' THEN 'frontend'
      |         WHEN event_type = 'signup' THEN 'auth'
      |         WHEN event_type = 'purchase' THEN 'payment'
      |         WHEN user_id % 2 = 0 THEN 'payment' ELSE 'catalog' END AS dst,
      |    CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err,
      |    CAST(floor(value * 100) AS BIGINT) AS latency_ms
      |  FROM events)
      |SELECT src, dst,
      |  count(*) AS calls,
      |  CAST(sum(is_err) AS BIGINT) AS errors,
      |  round(CAST(sum(is_err) AS DOUBLE) / count(*), 4) AS error_rate,
      |  round(avg(latency_ms), 2) AS avg_ms,
      |  round(quantile_cont(latency_ms, 0.95), 2) AS p95_ms
      |FROM spans
      |GROUP BY src, dst
      |ORDER BY src, dst""".stripMargin

  // ---- C71b: trace analytics — trace groups -------------------------

  /** Trace groups: spans sessionize into traces (user × hour — the
    * deterministic stand-in for a propagated trace id), the ROOT span
    * (earliest; event_id is the scan-order tiebreak) names the group,
    * and groups aggregate trace count, span breadth, wall duration, and
    * error rate — the trace-group table OpenSearch Trace Analytics
    * leads with. Two aggregates: spans→traces shuffles on the trace
    * key once (map-side combined), traces→groups is |traces| rows in.
    */
  def traceGroups(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        concat(col("user_id"), lit(":"),
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd-HH")).as("trace_id"),
        col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"),
        (col("event_type") === "error").cast("long").as("is_err"))
      .groupBy(col("trace_id"))
      .agg(
        min_by(col("event_type"), col("event_id")).as("trace_group"),
        count(lit(1)).as("n_spans"),
        ((max(col("us")) - min(col("us"))) / lit(1000)).cast("long").as("duration_ms"),
        max(col("is_err")).as("has_err"))
      .groupBy(col("trace_group"))
      .agg(
        count(lit(1)).as("n_traces"),
        round(avg(col("n_spans")), 2).as("avg_spans"),
        round(avg(col("duration_ms")), 2).as("avg_ms"),
        max(col("duration_ms")).as("max_ms"),
        round(sum(col("has_err")).cast("double") / count(lit(1)), 4).as("error_rate"))
      .orderBy(col("trace_group"))

  /** C71c — tail-based trace sampling (the Data-Prepper/collector
    * policy that keeps observability affordable: retain EVERY trace
    * that contains an error, plus a deterministic hash-percentage of
    * healthy traces — the decision needs the WHOLE trace, hence
    * "tail"). Spark shape: one spans→traces aggregate (the C71b
    * exchange) computes each trace's error flag, the keep decision is
    * a pure hash expression on the trace id (md5 prefix as the
    * sampling lottery — deterministic, uniform, replayable), and the
    * report aggregates kept/dropped traffic per trace group. No
    * per-trace state store: the batch form IS the replay-exact
    * reference for the streaming sampler.
    */
  def tailSampling(spark: SparkSession, dir: String, pct: Int = 10): DataFrame =
    Tables.events(spark, dir)
      .select(
        concat(col("user_id"), lit(":"),
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd-HH")).as("trace_id"),
        col("event_id"), col("event_type"),
        (col("event_type") === "error").cast("long").as("is_err"))
      .groupBy(col("trace_id"))
      .agg(min_by(col("event_type"), col("event_id")).as("trace_group"),
        count(lit(1)).as("n_spans"), max(col("is_err")).as("has_err"))
      // the lottery: first 4 md5 hex chars as an integer in [0, 65536)
      .withColumn("keep",
        col("has_err") === 1 ||
          conv(substring(md5(col("trace_id")), 1, 4), 16, 10).cast("long") < pct * 65536 / 100)
      .groupBy(col("trace_group"), col("keep"))
      .agg(count(lit(1)).as("n_traces"), sum(col("n_spans")).as("n_spans"),
        sum(col("has_err")).as("n_err_traces"))
      .orderBy(col("trace_group"), col("keep"))

  val tailSamplingSql: String =
    """WITH traces AS (
      |  SELECT
      |    concat(user_id, ':', strftime(date_trunc('hour', ts), '%Y-%m-%d-%H')) AS trace_id,
      |    arg_min(event_type, event_id) AS trace_group,
      |    count(*) AS n_spans,
      |    max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS has_err
      |  FROM events
      |  GROUP BY 1),
      |d AS (
      |  SELECT *,
      |    has_err = 1 OR
      |      CAST(('0x' || substr(md5(trace_id), 1, 4))::BIGINT AS BIGINT) < 6553 AS keep
      |  FROM traces)
      |SELECT trace_group, keep,
      |  count(*) AS n_traces,
      |  CAST(sum(n_spans) AS BIGINT) AS n_spans,
      |  CAST(sum(has_err) AS BIGINT) AS n_err_traces
      |FROM d
      |GROUP BY trace_group, keep
      |ORDER BY trace_group, keep""".stripMargin

  val traceGroupsSql: String =
    """WITH traces AS (
      |  SELECT
      |    concat(user_id, ':', strftime(date_trunc('hour', ts), '%Y-%m-%d-%H')) AS trace_id,
      |    arg_min(event_type, event_id) AS trace_group,
      |    count(*) AS n_spans,
      |    CAST((max(epoch_us(ts)) - min(epoch_us(ts))) // 1000 AS BIGINT) AS duration_ms,
      |    max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS has_err
      |  FROM events
      |  GROUP BY 1)
      |SELECT trace_group,
      |  count(*) AS n_traces,
      |  round(avg(n_spans), 2) AS avg_spans,
      |  round(avg(duration_ms), 2) AS avg_ms,
      |  CAST(max(duration_ms) AS BIGINT) AS max_ms,
      |  round(CAST(sum(has_err) AS DOUBLE) / count(*), 4) AS error_rate
      |FROM traces
      |GROUP BY trace_group
      |ORDER BY trace_group""".stripMargin
}

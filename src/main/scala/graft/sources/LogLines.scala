package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic raw-log synthesis from the `events` table.
  *
  * The reference ingests real Apache httpd / NGINX access-log lines
  * (reference: lib/computes/ec2/ec2-startup.sh — Kinesis agent tails
  * /etc/httpd/logs; README.md:47 shows the combined-log-format sample).
  * The test environment has no web server, so we derive log lines
  * DETERMINISTICALLY from `events` columns; the DuckDB oracle then
  * derives the expected *parsed* fields directly from the same columns,
  * which verifies the parse round-trip without sharing any code path.
  */
object LogLines {

  /** Browser fleet — one agent per user_id % 4. */
  val agents: Seq[String] = Seq(
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/91.0.4472.124 Safari/537.36",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/14.1 Safari/605.1.15",
    "curl/7.68.0",
    "Mozilla/5.0 (X11; Linux x86_64; rv:89.0) Gecko/20100101 Firefox/89.0")

  def ipCol: Column =
    concat_ws(".", lit("10"), col("user_id") % 256, col("event_id") % 250, (col("event_id") * 7) % 250)

  def verbCol: Column =
    when(col("event_type").isin("signup", "purchase"), "POST").otherwise("GET")

  def pathCol: Column =
    concat(lit("/"), col("event_type"), lit("/"), (col("event_id") % 100).cast("string"))

  def statusCol: Column =
    when(col("event_type") === "error", 500)
      .when(col("event_type") === "signup", 201)
      .otherwise(200).cast("long")

  def bytesCol: Column = floor(col("value") * 10).cast("long")

  def agentCol: Column =
    element_at(array(agents.map(lit): _*), (col("user_id") % 4).cast("int") + 1)

  /** events → one Apache combined-log line per event.
    * `46.99.153.40 - - [29/Jul/2021:15:32:33 +0000] "GET / HTTP/1.1" 200 173 "-" "UA"`
    */
  def apacheLineCol: Column =
    // concat, not format_string: Formatter re-parses its pattern per row
    // in interpreted code; concat is one codegen'd UTF8String.concat
    concat(
      ipCol, lit(" - - ["),
      date_format(date_trunc("second", col("ts")), "dd/MMM/yyyy:HH:mm:ss +0000"),
      lit("] \""), verbCol, lit(" "), pathCol, lit(" HTTP/1.1\" "),
      statusCol.cast("string"), lit(" "), bytesCol.cast("string"),
      lit(" \"-\" \""), agentCol, lit("\""))

  def apacheLines(spark: SparkSession, dir: String): DataFrame =
    // raw-line synthesis + the downstream regex parse battery are
    // per-row CPU kernels: spread them over compute parallelism instead
    // of inheriting the scan's file-split count (one file locally)
    Tables.atComputeParallelism(Tables.events(spark, dir))
      .select(col("event_id"), apacheLineCol.as("line"))

  /** events → one Apache error_log line per event.
    * `[Wed Oct 11 14:32:52 2000] [error] [client 10.0.0.1] message`
    * (the second stream the reference's Kinesis agent tails —
    * lib/computes/ec2/ec2-startup.sh error_log flow).
    */
  def errorLevelCol: Column =
    when(col("event_type") === "error", "error")
      .when(col("event_type") === "signup", "warn")
      .otherwise("notice")

  def errorMsgCol: Column =
    concat(lit("File does not exist: /var/www/"), col("event_type"),
      lit("/"), (col("event_id") % 100).cast("string"))

  def errorLines(spark: SparkSession, dir: String): DataFrame =
    Tables.atComputeParallelism(Tables.events(spark, dir))
      .select(
        col("event_id"),
        concat(
          lit("["),
          date_format(date_trunc("second", col("ts")), "EEE MMM dd HH:mm:ss yyyy"),
          lit("] ["), errorLevelCol,
          lit("] [client "), ipCol,
          lit("] "), errorMsgCol).as("line"))

  /** events → one NGINX error_log line per event.
    * `2026/08/12 10:00:00 [error] 17#17: *42 open() "/usr/share/nginx/
    *  html/click/42" failed (2: No such file or directory), client:
    *  10.1.2.3, server: localhost`
    * — the EKS workload's error stream (the reference runs NGINX on
    * EKS: lib/computes/eks/nginx-service.ts:29-44).
    */
  def nginxErrorLines(spark: SparkSession, dir: String): DataFrame =
    Tables.atComputeParallelism(Tables.events(spark, dir))
      .select(
        col("event_id"),
        concat(
          date_format(date_trunc("second", col("ts")), "yyyy/MM/dd HH:mm:ss"),
          lit(" ["), errorLevelCol, lit("] "),
          ((col("event_id") % 16) + 1).cast("string"), lit("#"),
          ((col("event_id") % 16) + 1).cast("string"), lit(": *"),
          col("event_id").cast("string"),
          lit(" open() \"/usr/share/nginx/html/"), col("event_type"),
          lit("/"), (col("event_id") % 100).cast("string"),
          lit("\" failed (2: No such file or directory), client: "), ipCol,
          lit(", server: localhost")).as("line"))

  /** events → one FireLens-wrapped Apache line per event: the envelope
    * ECS stdout actually arrives in (lib/computes/ecs.ts:36). to_json
    * handles the quoting of the embedded combined-log line.
    */
  def firelensLines(spark: SparkSession, dir: String): DataFrame =
    Tables.atComputeParallelism(Tables.events(spark, dir))
      .select(
        col("event_id"),
        to_json(struct(
          concat(lit("c"), lpad((col("event_id") % 1000).cast("string"), 4, "0"))
            .as("container_id"),
          concat(lit("app-"), (col("event_id") % 4).cast("string"))
            .as("container_name"),
          lit("graft-cluster").as("ecs_cluster"),
          concat(lit("arn:aws:ecs:task/"), (col("event_id") % 16).cast("string"))
            .as("ecs_task_arn"),
          when(col("event_type") === "error", "stderr").otherwise("stdout")
            .as("source"),
          apacheLineCol.as("log"))).as("envelope"))

  /** events → one RFC-5424-ish syslog application line per event —
    * the third wire format a unified-log fleet tails (beside Apache
    * access/error): structured `key=value` app logs behind a syslog
    * priority + ISO timestamp header. Exists to exercise the C69 grok
    * processor on a format none of the hand-written batteries cover.
    * `<134>2024-01-01T00:00:07Z host-8 app[462]: level=ERROR user=8 took=6.55ms GET /error/0`
    */
  def syslogLines(spark: SparkSession, dir: String): DataFrame = {
    val level = when(col("event_type") === "error", "ERROR")
      .when(col("event_type") === "signup", "WARN")
      .otherwise("INFO")
    Tables.atComputeParallelism(Tables.events(spark, dir))
      .select(
        col("event_id"),
        concat(
          lit("<"), (lit(128) + col("user_id") % 8).cast("string"), lit(">"),
          date_format(date_trunc("second", col("ts")), "yyyy-MM-dd'T'HH:mm:ss'Z'"),
          lit(" host-"), (col("user_id") % 50).cast("string"),
          lit(" app["), (col("event_id") % 1000).cast("string"), lit("]: level="),
          level, lit(" user="), col("user_id").cast("string"),
          // decimal(20,6) render, not cast(string): a raw double-to-string
          // cast emits scientific notation outside [1e-3,1e7) ("1.0E-4"),
          // which %{NUMBER} can't match — the whole line would silently
          // fail grok. Decimal stringifies fixed-point at any magnitude.
          lit(" took="), col("value").cast("decimal(20,6)").cast("string"), lit("ms "),
          verbCol, lit(" "), pathCol).as("line"))
  }

  /** events → one Lambda-extension JSON batch per event (the shape the
    * reference's Firehose transformer receives — README.md:94-147:
    * an array of {time, type, record} entries where only
    * type=="function" records carry log payloads).
    */
  def lambdaBatches(spark: SparkSession, dir: String): DataFrame = {
    val iso = date_format(date_trunc("second", col("ts")), "yyyy-MM-dd'T'HH:mm:ss'Z'")
    val level = when(col("event_type") === "error", "ERROR")
      .when(col("event_type") === "signup", "WARN")
      .otherwise("INFO")
    val eid = col("event_id").cast("string")
    // concat, not format_string: Formatter re-parses the pattern per row
    // in interpreted code, while concat is a single codegen'd
    // UTF8String.concat — ~3× cheaper for this 250-char synthesis
    Tables.atComputeParallelism(Tables.events(spark, dir))
      .select(
      col("event_id"),
      concat(
        lit("""[{"time":""""), iso,
        lit("""","type":"platform.start","record":"req-"""), eid,
        lit(""""},{"time":""""), iso,
        lit("""","type":"function","record":""""),
        iso, lit("\\treq-"), eid, lit("\\t"), level, lit("\\tevent="), col("event_type"),
        lit(""""},{"time":""""), iso,
        lit("""","type":"platform.runtimeDone","record":"req-"""), eid,
        lit(""""}]""")).as("batch"))
  }
}

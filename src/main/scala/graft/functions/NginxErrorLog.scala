package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** NGINX `error_log` parse battery.
  *
  * The reference's EKS workload is NGINX (reference:
  * lib/computes/eks/nginx-service.ts:29-44 — the nginx container image
  * behind the Fluent Bit log route), and NGINX error lines use a
  * grammar that matches neither the Apache combined-log nor the Apache
  * error_log battery:
  *
  *   `2026/08/12 10:00:00 [error] 31#31: *17 open() "/x" failed
  *    (2: No such file or directory), client: 10.1.2.3, server: localhost`
  *
  * Without this battery every EKS error line lands in the DLQ. Same
  * design as the other batteries: codegen'd builtin expressions
  * (regexp_extract / to_timestamp), no UDFs, so the dispatch stays one
  * shuffle-free projection.
  */
object NginxErrorLog {

  /** `ts [level] pid#tid: *conn msg[, client: ip, server: name]`.
    * The message core is captured lazily so the optional trailing
    * `client:`/`server:` context fields split off when present; a line
    * without context keeps its whole remainder as the message.
    */
  val pattern: String =
    "^(\\d{4}/\\d{2}/\\d{2} \\d{2}:\\d{2}:\\d{2}) " +
      "\\[([a-z]+)\\] (\\d+)#(\\d+): \\*(\\d+) " +
      "(.*?)(?:, client: ([0-9.]+), server: (\\S+))?$"

  def tsRaw(line: Column): Column    = regexp_extract(line, pattern, 1)
  def level(line: Column): Column    = regexp_extract(line, pattern, 2)
  def pid(line: Column): Column      = regexp_extract(line, pattern, 3).cast("long")
  def tid(line: Column): Column      = regexp_extract(line, pattern, 4).cast("long")
  def conn(line: Column): Column     = regexp_extract(line, pattern, 5).cast("long")
  def msg(line: Column): Column      = regexp_extract(line, pattern, 6)
  def clientIp(line: Column): Column = regexp_extract(line, pattern, 7)
  def server(line: Column): Column   = regexp_extract(line, pattern, 8)

  /** `2026/08/12 10:00:00` → TimestampType (second precision). */
  def ts(line: Column): Column =
    to_timestamp(tsRaw(line), "yyyy/MM/dd HH:mm:ss")

  /** All parsed fields as a struct (stream-dispatch shape). */
  def parsed(line: Column): Column = struct(
    ts(line).as("ts"), level(line).as("level"), pid(line).as("pid"),
    conn(line).as("conn"), clientIp(line).as("client_ip"),
    msg(line).as("msg"))

  /** NGINX-error grammar check (format dispatch / DLQ routing). */
  def isValid(line: Column): Column = line.rlike(pattern)
}

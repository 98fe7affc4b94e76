package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Apache `error_log` parse battery.
  *
  * The reference's Kinesis agent ships BOTH access_log* AND error_log*
  * from the EC2 web tier into the same delivery stream (reference:
  * lib/computes/ec2/ec2-startup.sh — the agent.json `flows` block tails
  * /etc/httpd/logs/error_log* alongside access_log*), so a complete
  * transform battery must parse the classic error format too or every
  * error line lands in the DLQ:
  *
  *   `[Wed Oct 11 14:32:52 2000] [error] [client 127.0.0.1] message`
  *
  * Same design as the access battery: codegen'd builtin expressions
  * (regexp_extract / to_timestamp), no UDFs.
  */
object ApacheErrorLog {

  /** `[ts] [level] [client ip] message` */
  val pattern: String =
    "^\\[([^\\]]+)\\] \\[([a-z]+)\\] \\[client ([^\\]]+)\\] (.*)$"

  def tsRaw(line: Column): Column    = regexp_extract(line, pattern, 1)
  def level(line: Column): Column    = regexp_extract(line, pattern, 2)
  def clientIp(line: Column): Column = regexp_extract(line, pattern, 3)
  def msg(line: Column): Column      = regexp_extract(line, pattern, 4)

  /** `Wed Oct 11 14:32:52 2000` → TimestampType. Spark's pattern letter
    * `E` (day-of-week) is format-only, so parsing drops the fixed-width
    * `EEE ` prefix and reads the rest.
    */
  def ts(line: Column): Column =
    to_timestamp(substring(tsRaw(line), 5, 24), "MMM dd HH:mm:ss yyyy")

  /** All parsed fields as a struct. */
  def parsed(line: Column): Column = struct(
    ts(line).as("ts"), level(line).as("level"),
    clientIp(line).as("client_ip"), msg(line).as("msg"))

  /** Error-format grammar check (format dispatch / DLQ routing). */
  def isValid(line: Column): Column = line.rlike(pattern)
}

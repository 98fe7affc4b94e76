package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Apache combined-log-format parse battery (SURVEY §2 B1/B2/B4).
  *
  * The reference's EC2 transformer only wraps the raw line as
  * {"logs": line} (reference: lib/computes/ec2/lambda/index.js:4-6) and
  * README.md:58 calls out the intended enhancement — "extract the
  * timestamp, HTTP, and browser information ... as separate attributes".
  * This battery implements that enhancement Spark-first: every parser is
  * a codegen'd builtin expression chain (regexp_extract / to_timestamp /
  * case-when) — no Scala UDFs — so scan→parse→filter→agg stays inside
  * one whole-stage-codegen span at 100 TB.
  */
object ApacheLog {

  /** Combined log format:
    * ip ident user [ts] "verb path proto" status bytes "referrer" "agent"
    */
  val pattern: String =
    "^(\\S+) (\\S+) (\\S+) \\[([^\\]]+)\\] \"(\\S+) (\\S+) (\\S+)\" (\\d+) (\\d+|-) \"([^\"]*)\" \"([^\"]*)\"$"

  def ip(line: Column): Column       = regexp_extract(line, pattern, 1)
  def tsRaw(line: Column): Column    = regexp_extract(line, pattern, 4)
  def verb(line: Column): Column     = regexp_extract(line, pattern, 5)
  def path(line: Column): Column     = regexp_extract(line, pattern, 6)
  def proto(line: Column): Column    = regexp_extract(line, pattern, 7)
  def status(line: Column): Column   = regexp_extract(line, pattern, 8).cast("long")
  def bytes(line: Column): Column    = nullif(regexp_extract(line, pattern, 9), lit("-")).cast("long")
  def referrer(line: Column): Column = regexp_extract(line, pattern, 10)
  def agent(line: Column): Column    = regexp_extract(line, pattern, 11)

  /** `29/Jul/2021:15:32:33 +0000` → TimestampType (UTC session tz). */
  def ts(line: Column): Column =
    to_timestamp(tsRaw(line), "dd/MMM/yyyy:HH:mm:ss Z")

  /** All parsed fields as a struct — `select(parsed($"line").as("p"), $"p.*")`. */
  def parsed(line: Column): Column = struct(
    ip(line).as("ip"), ts(line).as("ts"), verb(line).as("verb"),
    path(line).as("path"), proto(line).as("proto"), status(line).as("status"),
    bytes(line).as("bytes"), referrer(line).as("referrer"), agent(line).as("agent"))

  /** A line that fails the grammar → parse failure (DLQ routing, A5). */
  def isValid(line: Column): Column = line.rlike(pattern)

  /** B2 — browser family from user-agent (README.md:58 "browser
    * information"). Order matters: Chrome UAs contain "Safari".
    */
  def browser(agent: Column): Column =
    when(agent.contains("Firefox"), "Firefox")
      .when(agent.contains("Chrome"), "Chrome")
      .when(agent.contains("Safari"), "Safari")
      .when(agent.startsWith("curl"), "curl")
      .otherwise("other")

  /** B2 — OS family from user-agent. */
  def os(agent: Column): Column =
    when(agent.contains("Windows"), "Windows")
      .when(agent.contains("Mac OS X"), "macOS")
      .when(agent.contains("Linux") || agent.contains("X11"), "Linux")
      .otherwise("other")

  /** B4 — the reference's minimal EC2 transform: raw line → {"logs": line}
    * (reference: lib/computes/ec2/lambda/index.js:4-6).
    */
  def wrapLogsJson(line: Column): Column = to_json(struct(line.as("logs")))
}

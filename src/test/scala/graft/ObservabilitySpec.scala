package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{ApacheLog, Grok}
import graft.operators.Observability

/** C69–C71b: grok compiler semantics, ingest-pipeline fold, trace reads. */
class ObservabilitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("grok compiles field refs to ordered capture groups; bare refs don't capture") {
    val c = Grok.compile("""%{IP}:%{INT:port:int} %{WORD:name}""")
    assert(c.fields.map(f => (f._1, f._2)) == Seq(("port", 1), ("name", 2)))
    assert(!c.regex.contains("%{"))
  }

  test("grok composite COMMONAPACHELOG parses the reference sample like the hand battery") {
    val line =
      """46.99.153.40 - - [29/Jul/2021:15:32:33 +0000] "GET / HTTP/1.1" 200 173 "-" "UA""""
    val df = Grok.parse(Seq(line).toDF("line"), "line",
      """%{COMMONAPACHELOG} %{QUOTEDSTRING:referrer} %{QUOTEDSTRING:agent}""")
    val r = df.collect().head
    assert(r.getAs[String]("clientip") == "46.99.153.40")
    assert(r.getAs[String]("verb") == "GET")
    assert(r.getAs[String]("request") == "/")
    assert(r.getAs[String]("response") == "200")
    assert(r.getAs[String]("bytes") == "173")
    // same fields the hand-written battery extracts — two independent parsers agree
    val hand = Seq(line).toDF("line")
      .select(ApacheLog.ip(col("line")), ApacheLog.verb(col("line")),
        ApacheLog.status(col("line")).cast("string"))
      .collect().head
    assert(hand.toSeq == Seq(r.getAs[String]("clientip"), r.getAs[String]("verb"),
      r.getAs[String]("response")))
  }

  test("grok :int/:float conversions cast; non-matching line yields null ints, not errors") {
    val df = Grok.parse(Seq("<13>x", "garbage").toDF("line"), "line",
      """<%{INT:pri:int}>%{WORD:tag}""")
    val rows = df.orderBy(col("line")).collect() // '<' sorts before 'g'
    assert(rows(0).getAs[Long]("pri") == 13L)
    assert(rows(0).getAs[String]("tag") == "x")
    // "garbage" row: empty-string capture nullifies instead of ANSI-throwing
    assert(rows(1).isNullAt(rows(1).fieldIndex("pri")))
  }

  test("grok rejects unknown patterns and library cycles") {
    intercept[IllegalArgumentException](Grok.compile("%{NO_SUCH_PATTERN:x}"))
  }

  test("ingest pipeline folds processors in order into one projection") {
    import Observability._
    val df = Seq(("a", "{\"k\": 42}", 1.5)).toDF("event_type", "props", "value")
    val out = runPipeline(df, Seq(
      RenameP("props", "attrs"),
      GsubP("attrs", "[^0-9]", ""),
      ConvertP("attrs", "long"),
      UppercaseP("event_type"),
      SetP("pipeline_id", lit("p1")),
      RemoveP("value")))
    val r = out.collect().head
    assert(out.columns.toSeq == Seq("event_type", "attrs", "pipeline_id"))
    assert(r.toSeq == Seq("A", 42L, "p1"))
  }

  test("service map edge metrics from a planted span set") {
    // two calls web->catalog (one error-free), one error mobile->payment
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val ev = Seq(
      (1L, 0L, "view", t0, 1.0),   // user 0 -> web, view -> catalog
      (2L, 3L, "view", t0, 3.0),   // user 3 -> web
      (3L, 4L, "error", t0, 2.0))  // user 4 -> mobile, error even user -> payment
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    ev.write.mode("overwrite").parquet("/tmp/obs_spec/events.parquet")
    val m = Observability.serviceMap(spark, "/tmp/obs_spec")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(m.toSet == Set(("web", "catalog", 2L, 0L), ("mobile", "payment", 1L, 1L)))
  }

  test("trace groups: root span names the group, duration spans the trace") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 10:00:02")
    val ev = Seq(
      (1L, 7L, "view", t0, 1.0),
      (2L, 7L, "error", t1, 1.0),   // same user+hour -> same trace, root = view
      (3L, 9L, "click", t1, 1.0))   // its own trace
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    ev.write.mode("overwrite").parquet("/tmp/obs_spec2/events.parquet")
    val g = Observability.traceGroups(spark, "/tmp/obs_spec2").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(4), r.getDouble(5)))
    assert(g.toSet == Set(("view", 1L, 2000L, 1.0), ("click", 1L, 0L, 0.0)))
  }
}

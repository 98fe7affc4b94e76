package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{ApacheLog, LambdaLogs}

/** B-block parse battery on the reference's own documented samples. */
class TransformSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // reference README.md:47 sample input line
  val sampleLine =
    """46.99.153.40 - - [29/Jul/2021:15:32:33 +0000] "GET / HTTP/1.1" 200 173 "-" "Mozilla/5.0 (Windows NT 6.1; WOW64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/51.0.2704.103 Safari/537.36""""

  test("apache combined-log parse extracts the documented fields") {
    val df = Seq(sampleLine).toDF("line")
      .select(ApacheLog.parsed(col("line")).as("p")).select("p.*")
    val r = df.collect().head
    assert(r.getAs[String]("ip") == "46.99.153.40")
    assert(r.getAs[String]("verb") == "GET")
    assert(r.getAs[String]("path") == "/")
    assert(r.getAs[Long]("status") == 200L)
    assert(r.getAs[Long]("bytes") == 173L)
    assert(r.getAs[java.sql.Timestamp]("ts").toInstant.toString == "2021-07-29T15:32:33Z")
    assert(r.getAs[String]("agent").contains("Chrome/51.0"))
  }

  test("user-agent browser/os extraction") {
    val df = Seq(sampleLine).toDF("line")
      .select(ApacheLog.browser(ApacheLog.agent(col("line"))).as("b"),
        ApacheLog.os(ApacheLog.agent(col("line"))).as("o"))
    assert(df.collect().head.toSeq == Seq("Chrome", "Windows"))
  }

  test("invalid lines are flagged for the DLQ") {
    val df = Seq(sampleLine, "not a log line at all").toDF("line")
      .select(ApacheLog.isValid(col("line")).as("v"))
    assert(df.collect().map(_.getBoolean(0)).toSeq == Seq(true, false))
  }

  test("dash bytes field (no response body) parses to null, not a failure") {
    val line =
      """1.2.3.4 - - [29/Jul/2021:15:32:33 +0000] "HEAD / HTTP/1.1" 304 - "-" "curl/7.68.0""""
    val df = Seq(line).toDF("line")
    assert(df.select(ApacheLog.isValid(col("line"))).collect().head.getBoolean(0))
    val r = df.select(ApacheLog.parsed(col("line")).as("p")).select("p.*").collect().head
    assert(r.getAs[Long]("status") == 304L)
    assert(r.isNullAt(r.fieldIndex("bytes")))
  }

  test("malformed lambda batch yields no function rows instead of failing") {
    val out = LambdaLogs.functionLogs(
      Seq(("b1", "not json at all"), ("b2", "[{\"broken\": }")).toDF("id", "batch"), "batch")
    assert(out.count() == 0)
  }

  test("wrapLogsJson matches the reference EC2 transformer output shape") {
    val out = Seq("hello world").toDF("line")
      .select(ApacheLog.wrapLogsJson(col("line")).as("j")).collect().head.getString(0)
    assert(out == """{"logs":"hello world"}""")
  }

  test("lambda transformer keeps only type==function records (README sample)") {
    // README.md:94-147 shape: platform.* records interleaved with function records
    val batch =
      """[{"time":"2021-07-29T19:54:08.949Z","type":"platform.start","record":{"requestId":"024ae572"}},
        |{"time":"2021-07-29T19:54:09.096Z","type":"function","record":"2021-07-29T19:54:09.094Z\tundefined\tINFO\tLoading function\n"},
        |{"time":"2021-07-29T19:54:09.097Z","type":"function","record":"2021-07-29T19:54:09.097Z\t024ae572\tINFO\tvalue1 = value1\n"},
        |{"time":"2021-07-29T19:54:09.098Z","type":"platform.runtimeDone","record":{"requestId":"024ae572"}}]""".stripMargin.replace("\n", "")
    val out = LambdaLogs.functionLogs(Seq(("b1", batch)).toDF("id", "batch"), "batch")
    val rows = out.collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[String]("level")).forall(_ == "INFO"))
    assert(rows.head.getAs[String]("msg").startsWith("Loading function"))
  }

  test("pattern diff classifies NEW / GONE / BOTH templates around the split (C53b)") {
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")
    val frames = Seq(
      (ts(10), "old failure"), (ts(12), "old failure"),          // GONE
      (ts(20), "fresh failure"), (ts(21), "fresh failure"),      // NEW
      (ts(10), "steady"), (ts(20), "steady"), (ts(21), "steady") // BOTH, ratio 2.0
    ).toDF("ts", "template")
    val got = graft.operators.Slo.patternDiffDf(frames, "2024-01-16 00:00:00")
      .select("template", "n_before", "n_after", "status", "after_before_ratio")
      .as[(String, Long, Long, String, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(got("old failure") == (("old failure", 2L, 0L, "GONE", None)))
    assert(got("fresh failure") == (("fresh failure", 0L, 2L, "NEW", None)))
    assert(got("steady") == (("steady", 1L, 2L, "BOTH", Some(2.0))))
  }
}

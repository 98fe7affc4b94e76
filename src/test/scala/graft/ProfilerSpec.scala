package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Profiler

/** F11/C72 — the _profile surface: executed-plan metric dump. */
class ProfilerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("profile reports scan output rows and shows the pushed filter's effect") {
    val ev = graft.sources.Tables.events(spark, TestSpark.sf)
    val total = ev.count()
    val filtered = ev.filter(col("event_type") === "error")
      .groupBy(col("user_id")).count()
    val prof = Profiler.profile(spark, filtered).collect()
      .map(r => (r.getAs[String]("node"), r.getAs[String]("metric"), r.getAs[Long]("value")))
    assert(prof.nonEmpty)
    // the scan reports its row count; the Filter node shows the cut
    // (parquet pushdown prunes row groups, not rows, so the scan's own
    // count stays the table size at this scale)
    val scanRows = prof.collect {
      case (n, "numOutputRows", v) if n.toLowerCase.contains("scan") => v
    }
    assert(scanRows.nonEmpty, s"no scan metric in ${prof.map(_._1).distinct.toSeq}")
    assert(scanRows.max == total)
    val filterRows = prof.collect {
      case ("Filter", "numOutputRows", v) => v
    }
    assert(filterRows.nonEmpty && filterRows.min < scanRows.max,
      s"filter not reflected: $filterRows vs $scanRows")
    // the aggregate reports its group count
    val aggRows = prof.collect {
      case (n, "numOutputRows", v) if n.contains("HashAggregate") => v
    }
    assert(aggRows.nonEmpty && aggRows.min <= 150) // <= distinct users
  }

  test("profile covers exchanges so shuffle volume is visible") {
    val df = graft.sources.Tables.events(spark, TestSpark.sf)
      .groupBy(col("event_type")).agg(sum(col("value")).as("s"))
    val prof = Profiler.profile(spark, df).collect()
      .map(r => (r.getAs[String]("node"), r.getAs[String]("metric")))
    assert(prof.exists { case (n, m) =>
      n.contains("Exchange") && m.toLowerCase.contains("shufflebyteswritten") })
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Ppl

class PplSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(q: String) = Ppl.run(spark, TestSpark.sf, q)

  test("where + fields + sort + head compose; results match hand-built query") {
    val got = run("search source=events | where value > 100 and event_type = 'view' " +
        "| fields event_id, value | sort - value | head 5")
      .as[(Long, Double)].collect().toSeq
    val want = graft.sources.Tables.events(spark, TestSpark.sf)
      .filter(col("value") > 100 && col("event_type") === "view")
      .select(col("event_id"), col("value"))
      .orderBy(col("value").desc).limit(5)
      .as[(Long, Double)].collect().toSeq
    assert(got == want && got.nonEmpty)
  }

  test("eval arithmetic with precedence; fields - exclusion; dedup") {
    val got = run("search source=region | eval double_key = r_regionkey * 2 + 1 " +
        "| fields - r_comment | dedup r_name | sort + r_regionkey")
    assert(got.columns.toSeq == Seq("r_regionkey", "r_name", "double_key"))
    val keys = got.select("double_key").as[Long].collect().toSeq
    assert(keys == got.select("r_regionkey").as[Long].collect().toSeq.map(_ * 2 + 1))
  }

  test("stats with and without by; all agg functions; aliases and defaults") {
    val byType = run("search source=events | stats count() as n, dc(user_id), " +
        "sum(value) as total, avg(value), min(value), max(value) by event_type")
    assert(byType.columns.sorted.toSeq ==
      Seq("avg_value", "dc_user_id", "event_type", "max_value", "min_value", "n", "total"))
    val global = run("search source=events | stats count() as n")
    assert(global.as[Long].head() ==
      graft.sources.Tables.events(spark, TestSpark.sf).count())
  }

  test("string comparisons, or/not, parens in where") {
    val got = run("search source=nation | where (n_regionkey = 0 or n_regionkey = 1) " +
        "and not n_name = 'NATION_0' | stats count() as n")
    val want = graft.sources.Tables.nation(spark, TestSpark.sf)
      .filter((col("n_regionkey") === 0 || col("n_regionkey") === 1) &&
        col("n_name") =!= "NATION_0").count()
    assert(got.as[Long].head() == want)
  }

  test("driver-time errors: bad start, unknown table, unknown command") {
    assert(intercept[IllegalArgumentException] { run("source=events | head 1") }
      .getMessage.contains("must start with"))
    assert(intercept[IllegalArgumentException] { run("search source=nope | head 1") }
      .getMessage.contains("unknown source table"))
    assert(intercept[IllegalArgumentException] { run("search source=events | frobnicate x") }
      .getMessage.contains("unknown PPL command"))
  }

  test("where predicate pushes to the parquet scan") {
    val plan = run("search source=nation | where n_regionkey >= 2")
      .queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(n_regionkey,2)"),
      s"not pushed:\n$plan")
  }
}

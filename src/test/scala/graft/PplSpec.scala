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

  test("top/rare match hand-built frequency queries, grouped and global") {
    val ev = graft.sources.Tables.events(spark, TestSpark.sf)
    // global top 3 event types
    val got = run("search source=events | top 3 event_type")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = ev.groupBy(col("event_type")).agg(count(lit(1)).as("count"))
      .orderBy(col("count").desc, col("event_type")).limit(3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want)
    // rare = ascending
    val gotRare = run("search source=events | rare 2 event_type")
      .collect().map(_.getString(0)).toSeq
    val wantRare = ev.groupBy(col("event_type")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").asc, col("event_type")).limit(2)
      .collect().map(_.getString(0)).toSeq
    assert(gotRare == wantRare)
    // grouped: 2 most frequent user_ids per event_type — every group
    // emits ≤2 rows and each matches the window-derived truth
    val grouped = run("search source=events | top 2 user_id by event_type")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"))
      .orderBy(col("count").desc, col("user_id"))
    val truth = ev.groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("count"))
      .withColumn("r", row_number().over(w)).filter(col("r") <= 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(grouped == truth)
  }

  test("span() time bucketing in stats-by matches the hand-written date_histogram (C57c)") {
    val got = run("search source=events | stats count() as n by span(ts, 1d) | sort + span_ts")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toSeq
    val want = graft.sources.Tables.events(spark, TestSpark.sf)
      .groupBy(date_trunc("day", col("ts")).as("span_ts"))
      .agg(count(lit(1)).as("n")).orderBy(col("span_ts"))
      .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toSeq
    assert(got == want && got.nonEmpty)
    // hourly unit parses too and produces >= as many buckets
    assert(run("search source=events | stats count() as n by span(ts, 1h)").count() >= got.size)
  }

  test("eventstats joins window metrics to every row; rename and fillnull compose (C57b)") {
    val ev = graft.sources.Tables.events(spark, TestSpark.sf)
    val got = run("search source=events " +
        "| eventstats count() as n, avg(value) as av, dc(user_id) as du by event_type " +
        "| rename av as mean_v | fields event_id, event_type, n, mean_v, du " +
        "| sort + event_id | head 10")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getLong(4))).toSeq
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("event_type"))
    val want = ev
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("mean_v", avg(col("value")).over(w))
      .withColumn("du", size(collect_set(col("user_id")).over(w)).cast("long"))
      .select(col("event_id"), col("event_type"), col("n"), col("mean_v"), col("du"))
      .orderBy(col("event_id")).limit(10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getLong(4))).toSeq
    assert(got == want)
    // row count is preserved — eventstats never collapses
    assert(run("search source=events | eventstats count() as n by event_type").count() == ev.count())
  }

  test("fillnull wires a coalesce: values unchanged where non-null, field becomes non-nullable") {
    val out = run("search source=events | fillnull with 0 in value | fields event_id, value | sort + event_id | head 5")
    assert(!out.schema("value").nullable, "fillnull must pin the field non-nullable")
    val want = graft.sources.Tables.events(spark, TestSpark.sf)
      .select(col("event_id"), col("value")).orderBy(col("event_id")).limit(5)
      .as[(Long, Double)].collect().toSeq
    assert(out.as[(Long, Double)].collect().toSeq == want)
    assert(intercept[IllegalArgumentException] {
      run("search source=events | fillnull value")
    }.getMessage.contains("fillnull needs"))
  }

  test("parse extracts named regex captures as columns") {
    val got = run(
      "search source=events | parse props 'k\": (?<kv>[0-9]+)' " +
        "| fields event_id, kv | sort + event_id | head 5")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val want = graft.sources.Tables.events(spark, TestSpark.sf)
      .select(col("event_id"),
        regexp_extract(col("props"), "k\": ([0-9]+)", 1).as("kv"))
      .orderBy(col("event_id")).limit(5)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == want && got.forall(_._2.nonEmpty))
    assert(intercept[IllegalArgumentException] {
      run("search source=events | parse props 'no captures here'")
    }.getMessage.contains("no (?<name>"))
  }

  test("patterns strips alphanumerics into the template skeleton; new_field renames (C57d)") {
    val got = run("search source=events | patterns props | fields event_id, patterns_field " +
        "| sort + event_id | head 3")
      .collect().map(_.getString(1)).toSeq
    // props is {"k": NN} -> skeleton is always {"": }
    assert(got == Seq("{\"\": }", "{\"\": }", "{\"\": }"))
    val renamed = run("search source=events | patterns props new_field=shape | head 1")
    assert(renamed.columns.contains("shape") && !renamed.columns.contains("patterns_field"))
  }
}

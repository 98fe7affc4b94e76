package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.QueryDsl
import graft.operators.Clustering

/** C82 Query-DSL compiler semantics + C81 k-means contract. */
class QueryDslSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val df = Seq(
    (1L, "error timeout on request", "ec2", 500L, 12.5),
    (2L, "ok fast response", "ecs", 200L, 3.0),
    (3L, "error disk full", "eks", 503L, 9.0),
    (4L, "slow warning response", "ec2", 200L, 55.0),
    (5L, null, "lambda", 404L, 1.0)
  ).toDF("doc_id", "msg", "source", "status", "latency")

  private def ids(json: String): Seq[Long] =
    df.filter(QueryDsl.compile(df, json)).select("doc_id")
      .as[Long].collect().sorted.toSeq

  test("bool must/filter/must_not compose; range bounds honored") {
    val q = """{"query":{"bool":{
      "must":[{"match":{"msg":"error"}}],
      "filter":[{"range":{"status":{"gte":500,"lte":599}}}],
      "must_not":[{"term":{"source":"eks"}}]}}}"""
    assert(ids(q) == Seq(1L))
  }

  test("match defaults to OR over tokens; operator and requires all") {
    assert(ids("""{"match":{"msg":"error fast"}}""") == Seq(1L, 2L, 3L))
    assert(ids("""{"match":{"msg":{"query":"error disk","operator":"and"}}}""") == Seq(3L))
  }

  test("match_phrase needs the contiguous phrase") {
    assert(ids("""{"match_phrase":{"msg":"disk full"}}""") == Seq(3L))
    assert(ids("""{"match_phrase":{"msg":"full disk"}}""").isEmpty)
  }

  test("minimum_should_match counts satisfied should legs") {
    val q = """{"bool":{"should":[
      {"term":{"source":"ec2"}},
      {"range":{"latency":{"gt":50}}},
      {"term":{"status":500}}],
      "minimum_should_match":2}}"""
    assert(ids(q) == Seq(1L, 4L)) // 1: ec2+500; 4: ec2+latency>50
  }

  test("bare should (no must) defaults minimum_should_match to 1") {
    val q = """{"bool":{"should":[{"term":{"source":"eks"}},{"term":{"source":"lambda"}}]}}"""
    assert(ids(q) == Seq(3L, 5L))
  }

  test("wildcard maps * and ? and escapes LIKE metacharacters; prefix + exists + terms + ids") {
    assert(ids("""{"wildcard":{"msg":"*t?meout*"}}""") == Seq(1L))
    assert(ids("""{"wildcard":{"msg":"error%"}}""").isEmpty) // literal %, not a wildcard
    assert(ids("""{"prefix":{"msg":"slow"}}""") == Seq(4L))
    assert(ids("""{"bool":{"must_not":[{"exists":{"field":"msg"}}]}}""") == Seq(5L))
    assert(ids("""{"terms":{"source":["eks","lambda"]}}""") == Seq(3L, 5L))
    assert(ids("""{"ids":{"values":[2,4]}}""") == Seq(2L, 4L))
  }

  test("wildcard backslash-escapes: \\* and \\? are literals, lone backslash literal") {
    val esc = Seq((10L, "star * here", "x", 0L, 0.0),
      (11L, "question ? mark", "x", 0L, 0.0),
      (12L, "back\\slash", "x", 0L, 0.0),
      (13L, "starless line", "x", 0L, 0.0)
    ).toDF("doc_id", "msg", "source", "status", "latency")
    def eids(json: String): Seq[Long] =
      esc.filter(QueryDsl.compile(esc, json)).select("doc_id")
        .as[Long].collect().sorted.toSeq
    // escaped * = literal asterisk, not any-run: doc 13 must NOT match
    assert(eids("""{"wildcard":{"msg":"star \\* here"}}""") == Seq(10L))
    assert(eids("""{"wildcard":{"msg":"*\\**"}}""") == Seq(10L))
    // escaped ? = literal question mark
    assert(eids("""{"wildcard":{"msg":"*\\?*"}}""") == Seq(11L))
    // \\ = literal backslash; unescaped * still wildcards around it
    assert(eids("""{"wildcard":{"msg":"*\\\\*"}}""") == Seq(12L))
  }

  test("must_not over a NULL field keeps the row (three-valued logic normalized)") {
    // doc 5 has msg NULL: NOT contains(NULL) would be NULL and drop it
    assert(ids("""{"bool":{"must_not":[{"match":{"msg":"error"}}]}}""") == Seq(2L, 4L, 5L))
  }

  test("unsupported clause and malformed body are driver-time errors") {
    intercept[IllegalArgumentException](QueryDsl.compile(df, """{"fuzzy_zzz":{"msg":"x"}}"""))
    intercept[IllegalArgumentException](QueryDsl.compile(df, """{"range":{"status":{}}}"""))
  }

  test("conjunctive legs reach the scan as pushed filters on parquet") {
    val ev = graft.sources.Tables.events(spark, TestSpark.sf)
    val q = """{"bool":{"filter":[{"term":{"event_type":"view"}},
      {"range":{"value":{"gte":100}}}]}}"""
    val plan = ev.filter(QueryDsl.compile(ev, q)).queryExecution.executedPlan.toString()
    assert(plan.contains("PushedFilters") && plan.contains("event_type"), s"plan:\n$plan")
  }

  test("k-means: fixed-round Lloyd converges to stable clusters and exact inertia") {
    val out = Clustering.kmeans(spark, TestSpark.sf).collect()
    assert(out.length == 4)
    val total = out.map(_.getAs[Long]("n_docs")).sum
    val nDocs = graft.sources.Tables.documents(spark, TestSpark.sf).count()
    assert(total == nDocs) // every doc assigned exactly once
    // more rounds can only keep or shrink inertia (Lloyd's descent property,
    // floor-quantized centroids allow equality)
    val i5 = out.map(_.getAs[Long]("inertia")).sum
    val i8 = Clustering.kmeans(spark, TestSpark.sf, iters = 8)
      .collect().map(_.getAs[Long]("inertia")).sum
    assert(i8 <= i5, s"inertia rose with rounds: $i5 -> $i8")
    // determinism: identical re-run
    val again = Clustering.kmeans(spark, TestSpark.sf).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Alerting

/** C49 — percolate edge paths the fixed oracle rule set can't reach. */
class AlertingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("percolate reports zero-match rules as n=0 rows instead of dropping them") {
    val rules = Seq(
      (0L, "view", 0.0, 1000.0),        // matches plenty
      (1L, "no_such_type", 0.0, 1.0),   // term never matches
      (2L, "view", -10.0, -1.0)         // term matches, band never does
    ).toDF("rule_id", "etype", "min_val", "max_val")
    val got = Alerting.percolate(spark, TestSpark.sf, Some(rules))
      .select("rule_id", "n_matches", "n_users")
      .as[(Long, Long, Long)].collect()
      .map { case (r, m, u) => r -> ((m, u)) }.toMap
    assert(got.keySet == Set(0L, 1L, 2L))
    assert(got(0L)._1 > 0 && got(0L)._2 > 0)
    assert(got(1L) == ((0L, 0L)) && got(2L) == ((0L, 0L)))
  }

  test("indexed percolator matches the when()-bank form on the SAME four DQL rules") {
    // the C49b rules decomposed into (any-of terms, residual bounds):
    //   0: event_type:error AND value:>=200
    //   1: event_type:purchase AND value:[250 TO *]
    //   2: (event_type:signup OR event_type:click) AND value:<0.1
    //   3: event_type:error AND user_id:<5
    val structured = Seq(
      (0L, Seq("error"), Some(200.0), None, None),
      (1L, Seq("purchase"), Some(250.0), None, None),
      (2L, Seq("signup", "click"), None, Some(0.1), None),
      (3L, Seq("error"), None, None, Some(5L)))
      .toDF("rule_id", "terms", "vmin", "vmax", "umax")
    val indexed = Alerting.percolateIndexed(spark, TestSpark.sf, Some(structured))
      .select("rule_id", "n_matches", "n_users")
      .as[(Long, Long, Long)].collect().toSeq.sorted
    val bank = Alerting.percolateQueryString(spark, TestSpark.sf)
      .select("rule_id", "n_matches", "n_users")
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(indexed == bank, s"indexed=$indexed bank=$bank")
    assert(indexed.exists(_._2 > 0), "parity on all-zero counts proves nothing")
  }

  test("indexed percolator scans the fact table ONCE regardless of rule count") {
    val df = Alerting.percolateIndexed(spark, TestSpark.sf)
    val plan = df.queryExecution.executedPlan.toString
    val factScans = "Scan parquet".r.findAllIn(plan).size
    assert(factScans == 1, s"expected 1 events scan, plan has $factScans:\n$plan")
    // and the rule battery must ride a join, not a per-rule expression bank
    assert(!plan.contains("CASE WHEN (event_type"), "rules leaked into a when() bank")
  }

  test("every default rule carries its etype and band faithfully") {
    val r = Alerting.rules(spark)
      .as[(Long, String, Double, Double)].collect().sortBy(_._1)
    assert(r.length == 8)
    r.foreach { case (id, etype, lo, hi) =>
      assert(etype == Alerting.etypes((id % 5).toInt))
      assert(lo == id * 10.0 && hi == id * 10.0 + 40.0)
    }
  }
}

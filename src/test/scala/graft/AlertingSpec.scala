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

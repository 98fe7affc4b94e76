package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LogAnalytics

/** Accuracy bounds for the sketch-based scale paths (SURVEY §2 C5/C6):
  * the approximate operators must track their exact twins within the
  * sketches' configured error.
  */
class ApproxSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("HLL cardinality within 2% of exact per group") {
    val exact = LogAnalytics.cardinality(spark, TestSpark.sf)
      .select("event_type", "users").as[(String, Long)].collect().toMap
    val approx = LogAnalytics.cardinalityApprox(spark, TestSpark.sf)
      .select("event_type", "users").as[(String, Long)].collect().toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e <= 0.02, s"$k: exact=$e approx=$a")
    }
  }

  test("HLL rolling-window distinct within 5% of the exact WAU tile per day (C67 scale path)") {
    val exact = graft.operators.Extras.rollingDistinct(spark, TestSpark.sf)
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    val approx = graft.operators.Extras.rollingDistinctApprox(spark, TestSpark.sf)
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (d, e) =>
      val a = approx(d)
      assert(math.abs(a - e).toDouble / e <= 0.05, s"$d: exact=$e approx=$a")
    }
  }

  test("approx_percentile within 5% of exact per group") {
    val exact = LogAnalytics.percentiles(spark, TestSpark.sf)
      .select("event_type", "p50", "p90").as[(String, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val approx = LogAnalytics.percentilesApprox(spark, TestSpark.sf)
      .select("event_type", "p50", "p90").as[(String, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    exact.foreach { case (k, (e50, e90)) =>
      val (a50, a90) = approx(k)
      assert(math.abs(a50 - e50) / e50 <= 0.05, s"$k p50: $e50 vs $a50")
      assert(math.abs(a90 - e90) / e90 <= 0.05, s"$k p90: $e90 vs $a90")
    }
  }
}

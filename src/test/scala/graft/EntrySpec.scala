package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke: entry + every declared query runs and yields rows at sf0.001,
  * and every oracleSql key has a matching queries entry.
  */
class EntrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys ⊆ queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val n = fn(spark, TestSpark.sf).count()
      assert(n > 0, s"$name returned no rows")
    }
  }
}

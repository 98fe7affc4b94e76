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

  test("q_search_wildcard pushes the LIKE prefix into the parquet scan") {
    val plan = graft.operators.LogAnalytics.searchWildcard(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    // the prefix arm must reach the scan as a StartsWith data-source
    // filter; the regexp arm stays a residual filter above it
    assert(plan.contains("StartsWith(event_type,pu"), s"no pushed prefix in:\n$plan")
  }

  test("q_ip_enrich is a bucketed hash join, not a nested-loop range join") {
    val plan = graft.operators.Network.ipEnrich(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNLJ in:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin"),
      s"no equi-join on the /16 bucket in:\n$plan")
  }

  test("q_window_ranks is SQL-native: no RDD scan, range shuffle paid once") {
    val df = graft.operators.Extras.windowRanks(spark, TestSpark.sf)
    df.collect() // finalize the adaptive plan before inspecting it
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Scan ExistingRDD") && !plan.contains("RDDScan"),
      s"RDD drop in:\n$plan")
    // both consumers of the range exchange (per-pid counts and the rank
    // stamping) must share ONE shuffle
    assert(plan.contains("ReusedExchange"), s"range exchange not reused in:\n$plan")
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale design proof (SURVEY §5): bucketed tables co-locate join keys
  * at WRITE time, so repeated fact-fact joins run with NO shuffle —
  * on a 100 TB warehouse this converts every orders⋈lineitem analysis
  * from a full-data exchange into a local zip of matching buckets.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("join of co-bucketed tables plans without a shuffle exchange") {
    val sf = TestSpark.sf
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    graft.sources.Tables.lineitem(spark, sf)
      .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_b")
    graft.sources.Tables.orders(spark, sf)
      .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("ord_b")

    val joined = spark.table("li_b")
      .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_quantity")).as("qty"))

    // disable broadcast so the join strategy is the bucket-aware
    // sort-merge join — the case that matters at fact×fact scale
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      // the only exchange allowed is the final single-partition agg;
      // the JOIN itself must consume bucketed scans directly
      val joinIdx = plan.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, s"expected SortMergeJoin in:\n$plan")
      val belowJoin = plan.substring(joinIdx)
      assert(!belowJoin.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      // and the result matches the unbucketed computation
      val expected = graft.sources.Tables.lineitem(spark, sf)
        .join(graft.sources.Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")).as("qty"))
        .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      val got = joined.collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      assert(got == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Tables.atComputeParallelism contract: widen narrow plans to compute
  * parallelism, leave already-wide plans UNTOUCHED (no gratuitous
  * shuffle of a wide scan).
  */
class ParallelismSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("seeded sampler and global shuffle order are invariant to shuffle partitioning") {
    // the reproducibility CLAIM of C2k/E25: same rows, same order, at
    // any parallelism — rerun byte-identical under a different
    // spark.sql.shuffle.partitions
    def snap(): (Seq[String], Seq[String]) = (
      graft.operators.LogAnalytics.samplerAgg(spark, TestSpark.sf)
        .collect().map(_.toString).toSeq,
      graft.operators.Curation.shuffleOrder(spark, TestSpark.sf)
        .collect().map(_.toString).toSeq)
    val base = snap()
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try assert(snap() == base, "results changed under different partitioning")
    finally spark.conf.set("spark.sql.shuffle.partitions", "4")
  }

  test("narrow input widens to defaultParallelism; wide input passes through unchanged") {
    val target = spark.sparkContext.defaultParallelism
    val narrow = Tables.documents(spark, TestSpark.sf) // single parquet file
    assume(narrow.rdd.getNumPartitions < target)
    assert(Tables.atComputeParallelism(narrow).rdd.getNumPartitions == target)

    val wide = narrow.repartition(target * 2)
    val out = Tables.atComputeParallelism(wide)
    // untouched: same plan object, no extra exchange
    assert(out eq wide)
    assert(out.rdd.getNumPartitions == target * 2)
  }
}

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
    // shuffleOrder uses the value-based bucket-offset cumsum (r12
    // migration off the id-stamping rankedByRange); mlmMasks and
    // canaryExposure keep rankedByRange but behind a localCheckpoint
    // that materializes ranks once — all three must be byte-stable
    // under a different partitioning
    def snap(): (Seq[String], Seq[String], Seq[String], Seq[String]) = (
      graft.operators.LogAnalytics.samplerAgg(spark, TestSpark.sf)
        .collect().map(_.toString).toSeq,
      graft.operators.Curation.shuffleOrder(spark, TestSpark.sf)
        .collect().map(_.toString).toSeq,
      graft.operators.SftData.mlmMasks(spark, TestSpark.sf)
        .collect().map(_.toString).toSeq,
      graft.operators.CorpusRisk.canaryExposure(spark, TestSpark.sf)
        .collect().map(_.toString).toSeq)
    val base = snap()
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try assert(snap() == base, "results changed under different partitioning")
    finally spark.conf.set("spark.sql.shuffle.partitions", "4")
  }

  test("batch mix: single-source corpus scores exactly zero; partition-invariant") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    (0L until 100L).map(i => (i, s"tok$i words here", "en", "only"))
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet("/tmp/par_bm/documents.parquet")
    val one = graft.operators.Curation.batchMix(spark, "/tmp/par_bm").collect()
    assert(one.length == 4) // 100 docs / 32 = 4 batches
    one.foreach { r =>
      assert(r.getAs[Long]("n_sources") == 1L)
      assert(r.getAs[Long]("chi2_micro") == 0L, r.toString)
    }
    // the E101-class regression guard: a multi-aggregate fan-out over a
    // sampled range exchange once shifted suffix ranks ±64 at sf0.1 —
    // the two-pass bucket-offset form must be partitioning-invariant
    def snap(): Seq[String] =
      graft.operators.Curation.batchMix(spark, TestSpark.sf)
        .collect().map(_.toString).toSeq
    val base = snap()
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try assert(snap() == base, "batch mix changed under different partitioning")
    finally spark.conf.set("spark.sql.shuffle.partitions", "4")
    base.foreach { s =>
      val chi = s.stripSuffix("]").split(",").last.toLong
      assert(chi >= -20L) // floor slack only; true chi-square is >= 0
    }
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

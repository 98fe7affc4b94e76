package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{InvertedIndex, Tables}

/** C50 — persisted positional inverted index: probes must be
  * partition-pruned to the term's token bucket, and phrase adjacency
  * must match a direct text scan.
  */
class InvertedIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def scannedFiles(df: DataFrame): Long = {
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collectLeaves().collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.tableIdentifier.isEmpty => s.metrics("numFiles").value
    }.sum
  }

  test("driver-side bucket replica matches the engine's crc32 bucketing") {
    val engine = Seq("spark", "hash", "join", "the", "zz9")
      .toDF("token")
      .select(col("token"), InvertedIndex.tokenBucket(col("token")).as("tb"))
      .as[(String, Long)].collect().toMap
    engine.foreach { case (t, tb) =>
      assert(InvertedIndex.bucketOf(t) == tb, s"token $t")
    }
  }

  test("term probe is partition-pruned to one bucket and postings match a text scan") {
    val idx = Files.createTempDirectory("graft-invidx-spec").toString
    InvertedIndex.build(spark, Tables.documents(spark, TestSpark.sf), idx)

    val allFiles = scannedFiles(spark.read.parquet(idx))
    val probeFiles = scannedFiles(InvertedIndex.postings(spark, idx, "spark"))
    assert(probeFiles > 0 && probeFiles * 2 <= allFiles,
      s"probe=$probeFiles all=$allFiles — no pruning")

    // postings tf equals a direct token-count scan
    val viaIndex = InvertedIndex.postings(spark, idx, "spark")
      .select(col("doc_id"), col("tf")).as[(Long, Long)].collect().toMap
    val direct = Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") === "spark")
      .groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    assert(viaIndex == direct)
  }

  test("phrase adjacency from positions matches a direct sliding scan") {
    val viaIndex = InvertedIndex.searchPhrase(spark, TestSpark.sf)
      .as[(Long, Long)].collect().toMap
    val direct = Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .as[(Long, Seq[String])].collect()
      .map { case (id, ws) =>
        id -> ws.sliding(2).count(p => p.length == 2 && p(0) == "hash" && p(1) == "join").toLong
      }.filter(_._2 > 0).toMap
    assert(viaIndex == direct && viaIndex.nonEmpty)
  }
}

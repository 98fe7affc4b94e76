package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.LogStore
import graft.streaming.LogPipeline

/** The full reference path composed end-to-end: raw multi-source log
  * lines → streaming ingest with DLQ → date/source-partitioned store →
  * dashboard analytics over the store → compaction → identical
  * analytics. A reference user's whole workflow in one test.
  */
class EndToEndSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ingest -> store -> analytics -> compact -> identical analytics") {
    val in = Files.createTempDirectory("graft-e2e-in").toString
    val out = Files.createTempDirectory("graft-e2e-out").toString
    val ckpt = Files.createTempDirectory("graft-e2e-ckpt").toString
    def line(day: Int, status: Int) =
      s"""10.0.0.$day - - [0$day/Aug/2021:12:00:00 +0000] "GET /x HTTP/1.1" $status 100 "-" "curl/7.68.0""""
    Files.createDirectories(Paths.get(s"$in/ec2"))
    Files.createDirectories(Paths.get(s"$in/eks"))
    Files.writeString(Paths.get(s"$in/ec2/a.log"),
      Seq(line(1, 200), line(1, 500), line(2, 200), "## junk ##").mkString("\n"))
    Files.writeString(Paths.get(s"$in/eks/b.log"),
      Seq(line(1, 200), line(2, 404)).mkString("\n"))

    LogPipeline.startIngest(spark, in, out, ckpt).awaitTermination()

    def errorRatePerDay() =
      LogStore.read(spark, s"$out/logs", "2021-08-01", "2021-08-03")
        .groupBy(col("log_date").cast("string").as("day"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("status") >= 400, 1).otherwise(0)).as("errors"))
        .orderBy(col("day"))
        .as[(String, Long, Long)].collect().toSeq

    val before = errorRatePerDay()
    assert(before == Seq(("2021-08-01", 3L, 1L), ("2021-08-02", 2L, 1L)))
    // the junk line went to the DLQ, not the store
    assert(spark.read.parquet(s"$out/dlq").count() == 1)

    LogStore.compact(spark, s"$out/logs")
    assert(errorRatePerDay() == before)
    // and the expiry path leaves only day 2
    LogStore.expire(spark, s"$out/logs", "2021-08-02")
    assert(errorRatePerDay() == before.filter(_._1 == "2021-08-02"))
  }

  test("lifecycle chain: rollover ingest -> compact gens -> snapshot -> searchable read -> federated alias") {
    val base = Files.createTempDirectory("graft-e2e-life").toString
    val root = s"$base/logs"
    def batch(day: Int, n: Int) = spark.range(n).select(
      concat(lit("10.1.0."), col("id") % 250).as("ip"),
      lit(java.sql.Timestamp.valueOf(f"2024-02-$day%02d 00:00:00")).as("ts"),
      (lit(200L) + (col("id") % 2) * 300).as("status"),
      lit("ec2").as("source"))
    // three batches roll three generations (tiny threshold)
    (1 to 3).foreach(d => LogStore.rolloverWrite(batch(d, 200), root, maxBytes = 1))
    val gens = new java.io.File(root).list().filter(_.startsWith("gen=")).sorted
    assert(gens.length == 3)

    // compact one generation; full read across gens unchanged
    LogStore.compact(spark, s"$root/${gens.head}")
    val all = LogStore.readRollover(spark, root, "2024-02-01", "2024-03-01")
    assert(all.count() == 600)

    // snapshot a generation, query it directly (searchable snapshot)
    val snap = s"$base/snap"
    LogStore.snapshot(spark, s"$root/${gens.last}", snap)
    val direct = LogStore.readSnapshot(spark, snap)
    assert(direct.count() == 200)
    assert(direct.filter(col("log_date") === "2024-02-03").count() == 200)

    // alias each generation and federate across them like multi-index
    val aliases = gens.zipWithIndex.map { case (g, i) =>
      val a = s"$base/gen$i.alias"; LogStore.setAlias(spark, a, s"$root/$g"); a
    }
    val federated = LogStore.readAliases(spark, aliases.toIndexedSeq)
    assert(federated.count() == 600)
    assert(federated.filter(col("status") >= 400).count() == 300)
  }
}

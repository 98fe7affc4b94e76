package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** E7c — persisted IVF index: cell-partitioned parquet + centroid
  * table; probes must be partition-pruned scans.
  */
class IvfIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def scannedFiles(df: DataFrame): Long = {
    df.collect() // execute THIS plan so its scan metrics populate
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collectLeaves().collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.tableIdentifier.isEmpty => s.metrics("numFiles").value
    }.sum
  }

  test("probe reads only the probed cells' partitions and returns per-query top-k") {
    val idx = Files.createTempDirectory("graft-ivf").toString
    val nCells = 8
    Similarity.writeIvfIndex(spark, TestSpark.sf, idx, nCells)

    val allFiles = scannedFiles(spark.read.parquet(s"$idx/cells"))
    assert(allFiles >= nCells, s"expected >= $nCells files, got $allFiles")

    val probed = Similarity.probeIvfIndex(spark, TestSpark.sf, idx, nProbe = 2)
    val rows = probed.collect()
    // 10 queries x top-5 per query
    assert(rows.length == Similarity.nQueries * Similarity.topK)
    assert(rows.map(_.getAs[Int]("rank")).forall(r => r >= 1 && r <= Similarity.topK))

    // the literal cell predicate the probe builds must partition-prune:
    // a 2-cell read touches only those cells' files
    import org.apache.spark.sql.functions.col
    val pruned = scannedFiles(
      spark.read.parquet(s"$idx/cells").filter(col("cell").isin(0, 1)))
    assert(pruned > 0 && pruned < allFiles, s"pruned=$pruned all=$allFiles")
  }
}

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

  test("ensureIvfIndex: _COMPLETE marks a fully-written index and a half-written one rebuilds") {
    // a crash between the cells and centroids writes must not leave a
    // readable-looking index: _COMPLETE is only written after BOTH
    val path = Similarity.ensureIvfIndex(spark, TestSpark.sf)
    val complete = new java.io.File(path, "_COMPLETE")
    val centroids = new java.io.File(path, "centroids")
    assert(complete.exists(), "ensureIvfIndex did not leave a _COMPLETE marker")
    assert(centroids.exists(), "no centroids dir beside _COMPLETE")

    // simulate the crash window: cells landed, centroids + marker did not
    assert(complete.delete())
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(centroids)
    assert(!centroids.exists())
    val rebuilt = Similarity.ensureIvfIndex(spark, TestSpark.sf)
    assert(rebuilt == path, "cache key changed for unchanged data")
    assert(complete.exists() && centroids.exists(),
      "half-written index was not rebuilt")
  }

  test("cluster-balanced sample: per-cell quota exact, small cells kept whole, deterministic") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val quota = 7
    val out = Similarity.clusterBalancedSample(spark, TestSpark.sf, quota).cache()
    val cellSizes = spark.read
      .parquet(s"${Similarity.ensureIvfIndex(spark, TestSpark.sf)}/cells")
      .groupBy("cell").count().as[(Int, Long)].collect().toMap
    val kept = out.groupBy("cell").count().as[(Int, Long)].collect().toMap
    // every cell contributes min(|cell|, quota) — exactly
    assert(kept.keySet == cellSizes.keySet)
    kept.foreach { case (cell, n) =>
      assert(n == math.min(cellSizes(cell), quota.toLong), s"cell $cell kept $n")
    }
    // kept ids are corpus members, ranked 1..n within each cell
    assert(out.filter(col("rk") > quota).isEmpty)
    // deterministic: a second run selects the identical rows
    val again = Similarity.clusterBalancedSample(spark, TestSpark.sf, quota)
    assert(out.unionByName(again).distinct().count() == out.count())
    out.unpersist()
  }

  test("incremental append assigns to nearest frozen centroid and is probe-visible; recenter = member means") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val idx = Files.createTempDirectory("graft-ivf-inc").toString
    Similarity.writeIvfIndex(spark, TestSpark.sf, idx, nCells = 8)

    // append exact duplicates of the query vectors under fresh ids —
    // after the append, each query's rank-1 neighbor MUST be its
    // duplicate at cos_sim 1.0 (immediate probe visibility, and the
    // duplicate's assigned cell necessarily equals the query's first
    // probe cell)
    val dupBase = 100000L
    val fresh = graft.sources.Tables.embeddings(spark, TestSpark.sf)
      .filter(col("vec_id") < Similarity.nQueries)
      .select((col("vec_id") + dupBase).as("n_id"), col("embedding").as("n_emb"))
    Similarity.appendToIvfIndex(spark, idx, fresh)

    // every appended vector sits in its argmax-cosine cell (recomputed
    // locally against the centroid table)
    val cents = spark.read.parquet(s"$idx/centroids")
      .as[(Int, Array[Float])].collect().toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val appended = spark.read.parquet(s"$idx/cells")
      .filter(col("n_id") >= dupBase)
      .select("n_id", "n_emb", "cell").as[(Long, Array[Float], Int)].collect()
    assert(appended.length == Similarity.nQueries)
    appended.foreach { case (id, emb, cell) =>
      val best = cents.maxBy { case (c, v) => (cos(emb, v), -c) }._1
      assert(cell == best, s"vec $id in cell $cell, nearest centroid $best")
    }

    val probed = Similarity.probeIvfIndex(spark, TestSpark.sf, idx, nProbe = 2).collect()
    probed.filter(_.getAs[Int]("rank") == 1).foreach { r =>
      assert(r.getAs[Long]("n_id") == r.getAs[Long]("q_id") + dupBase,
        s"query ${r.getAs[Long]("q_id")} rank-1 is not its appended duplicate")
      assert(r.getAs[Double]("cos_sim") == 1.0)
    }

    // recenter: each centroid becomes the mean of its current members
    Similarity.recenterIvfIndex(spark, idx)
    val members = spark.read.parquet(s"$idx/cells")
      .select("cell", "n_emb").as[(Int, Array[Float])].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val after = spark.read.parquet(s"$idx/centroids")
      .as[(Int, Array[Float])].collect().toMap
    after.foreach { case (cell, cent) =>
      val vs = members(cell)
      cent.indices.foreach { d =>
        val mean = vs.map(_(d).toDouble).sum / vs.length
        assert(math.abs(cent(d) - mean) < 1e-4, s"cell $cell dim $d")
      }
    }
    // probes still run against the recentered table
    assert(Similarity.probeIvfIndex(spark, TestSpark.sf, idx, nProbe = 2)
      .count() == Similarity.nQueries * Similarity.topK)
  }

  test("streaming ingest maintains the index: foreachBatch append, probe sees each batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext

    val idx = Files.createTempDirectory("graft-ivf-stream").toString
    Similarity.writeIvfIndex(spark, TestSpark.sf, idx, nCells = 8)
    val before = spark.read.parquet(s"$idx/cells").count()

    // stream exact duplicates of the first two query vectors in two
    // micro-batches; each batch is appended by the maintenance sink
    val qVecs = graft.sources.Tables.embeddings(spark, TestSpark.sf)
      .filter(col("vec_id") < 2)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)

    val ms = MemoryStream[(Long, Array[Float])]
    val q = ms.toDS().toDF("n_id", "n_emb").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Similarity.appendToIvfIndex(spark, idx, batch)
      }
      .start()
    try {
      ms.addData((200000L + qVecs(0)._1, qVecs(0)._2))
      q.processAllAvailable()
      assert(spark.read.parquet(s"$idx/cells").count() == before + 1)
      ms.addData((200000L + qVecs(1)._1, qVecs(1)._2))
      q.processAllAvailable()
      assert(spark.read.parquet(s"$idx/cells").count() == before + 2)
    } finally q.stop()

    // the streamed duplicates are immediately probe-visible at rank 1
    val rank1 = Similarity.probeIvfIndex(spark, TestSpark.sf, idx, nProbe = 2)
      .filter(col("rank") === 1 && col("q_id") < 2)
      .select(col("q_id"), col("n_id")).as[(Long, Long)].collect().toMap
    assert(rank1 == Map(0L -> 200000L, 1L -> 200001L))
  }
}

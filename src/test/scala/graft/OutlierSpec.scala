package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.IsoForest

class OutlierSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rng = new scala.util.Random(3)
  // tight 2D cluster around (10, 10) + three extreme planted outliers
  private val cluster = Array.fill(300)(
    Array(10.0 + rng.nextGaussian() * 0.5, 10.0 + rng.nextGaussian() * 0.5))
  private val planted = Array(
    Array(120.0, -40.0), Array(-90.0, 200.0), Array(55.0, 95.0))
  private val all = cluster ++ planted

  test("planted extremes isolate: their scores top every cluster point") {
    val forest = IsoForest.fit(all, seed = 7L)
    val clusterMax = cluster.map(forest.score).max
    planted.foreach { p =>
      assert(forest.score(p) > clusterMax,
        s"outlier ${p.toSeq} scored ${forest.score(p)} <= cluster max $clusterMax")
    }
    // scores live in the paper's (0, 1) range; cluster mass sits low
    assert(cluster.map(forest.score).sum / cluster.length < 0.6)
    planted.foreach(p => assert(forest.score(p) < 1.0 && forest.score(p) > 0.6))
  }

  test("seeded fit is bit-deterministic") {
    val a = IsoForest.fit(all, seed = 11L)
    val b = IsoForest.fit(all, seed = 11L)
    all.foreach(p => assert(a.score(p) == b.score(p)))
    // a different seed builds a different forest (sanity that the seed matters)
    val c = IsoForest.fit(all, seed = 12L)
    assert(all.exists(p => a.score(p) != c.score(p)))
  }

  test("operator returns a deterministic descending top-k over events") {
    val df1 = graft.operators.Outliers.outlierScores(spark, TestSpark.sf, k = 10)
      .as[(Long, Double, Long)].collect().toSeq
    val df2 = graft.operators.Outliers.outlierScores(spark, TestSpark.sf, k = 10)
      .as[(Long, Double, Long)].collect().toSeq
    assert(df1 == df2 && df1.size == 10)
    assert(df1.map(_._2) == df1.map(_._2).sorted.reverse)
    assert(df1.forall(t => t._2 > 0.0 && t._2 < 1.0))
    assert(df1.map(_._3) == (1L to 10L))
  }

  test("anomaly replay telemetry (q_anomaly_stream) is deterministic and count-consistent") {
    import graft.streaming.AnomalyDetector
    val a = AnomalyDetector.anomalyStreamReplay(spark, TestSpark.sf).collect().toSeq
    val b = AnomalyDetector.anomalyStreamReplay(spark, TestSpark.sf).collect().toSeq
    assert(a == b, "seeded replay must be byte-identical across runs")
    val perKey = graft.sources.Tables.events(spark, TestSpark.sf)
      .groupBy(org.apache.spark.sql.functions.col("event_type"))
      .count().as[(String, Long)].collect().toMap
    assert(a.map(_.getString(0)).toSet == perKey.keySet)
    a.foreach { r =>
      val (key, scored, trained, anomalies) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      // every point past the first shingle-1 produces a scored row
      assert(scored == perKey(key) - 3, s"$key scored=$scored n=${perKey(key)}")
      assert(trained <= scored && anomalies <= trained, s"$key $r")
    }
  }
}

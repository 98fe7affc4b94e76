package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity
import graft.plans.CosineSim

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("CosineSim computes the exact cosine (eval + codegen paths)") {
    CosineSim.register(spark)
    val df = Seq(
      (Array(1.0f, 0.0f, 0.0f), Array(1.0f, 0.0f, 0.0f)),   // identical → 1
      (Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),   // orthogonal → 0
      (Array(1.0f, 1.0f, 0.0f), Array(1.0f, 0.0f, 0.0f)),   // 45° → √2/2
      (Array(0.0f, 0.0f, 0.0f), Array(1.0f, 0.0f, 0.0f))    // zero vector → 0
    ).toDF("a", "b")
    val got = df.select(CosineSim(col("a"), col("b"))).as[Double].collect()
    val want = Seq(1.0, 0.0, math.sqrt(2) / 2, 0.0)
    got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-9) }
    // SQL registration path
    df.createOrReplaceTempView("vecs")
    val viaSql = spark.sql("SELECT cosine_sim(a, b) FROM vecs").as[Double].collect()
    got.zip(viaSql).foreach { case (g, s) => assert(g == s) }
  }

  test("LSH ANN reaches usable recall vs brute force and prunes candidates") {
    val exact = Similarity.annTopK(spark, TestSpark.sf)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.annLsh(spark, TestSpark.sf)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // random 64-dim embeddings are a worst case for LSH; the point here
    // is the plumbing + a sane floor, not production recall
    assert(recall >= 0.3, s"recall $recall")
    assert(approx.size <= exact.size * 2)
  }

  test("IVF ANN beats a random-subset baseline and bounds its output") {
    val exact = Similarity.annTopK(spark, TestSpark.sf)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.annIvf(spark, TestSpark.sf)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    // nProbe/nCells = 1/4 of the corpus scanned; similarity-biased cells
    // must recover clearly more than 1/4 of the true neighbors
    assert(recall >= 0.3, s"recall $recall")
    assert(ivf.size <= exact.size)
  }
}

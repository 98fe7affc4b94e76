package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

class PcaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val fit = Similarity.pcaFit(spark, TestSpark.sf, k = 4)

  test("basis is orthonormal, eigenvalues descending and non-negative (E49)") {
    val (_, basis, eig) = fit
    for (i <- basis.indices; j <- basis.indices) {
      val dot = basis(i).zip(basis(j)).map { case (a, b) => a * b }.sum
      if (i == j) assert(math.abs(dot - 1.0) < 1e-9, s"row $i not unit: $dot")
      else assert(math.abs(dot) < 1e-6, s"rows $i,$j not orthogonal: $dot")
    }
    assert(eig.forall(_ >= -1e-12), s"negative eigenvalue: ${eig.toSeq}")
    assert(eig.sliding(2).forall(p => p(0) >= p(1) - 1e-12),
      s"eigenvalues not descending: ${eig.toSeq}")
  }

  test("projected component variance matches its eigenvalue; top component beats any raw axis") {
    val (_, _, eig) = fit
    val proj = Similarity.pcaProject(spark, TestSpark.sf, k = 2)
    val v = proj.agg(
      (sum(col("p1") * col("p1")) / count(lit(1)) -
        pow(sum(col("p1")) / count(lit(1)), 2)).as("v1"),
      (sum(col("p2") * col("p2")) / count(lit(1)) -
        pow(sum(col("p2")) / count(lit(1)), 2)).as("v2"))
      .as[(Double, Double)].collect().head
    assert(math.abs(v._1 - eig(0)) / eig(0) < 0.05, s"var(p1)=${v._1} vs eig=${eig(0)}")
    assert(math.abs(v._2 - eig(1)) / eig(1) < 0.05, s"var(p2)=${v._2} vs eig=${eig(1)}")
    // the top component captures at least as much variance as the best raw axis
    val axisVar = (0 until 64).map { d =>
      graft.sources.Tables.embeddings(spark, TestSpark.sf)
        .select(element_at(col("embedding"), d + 1).cast("double").as("x"))
        .agg((sum(col("x") * col("x")) / count(lit(1)) -
          pow(sum(col("x")) / count(lit(1)), 2)).as("v"))
        .as[Double].collect().head
    }.max
    assert(eig(0) >= axisVar - 1e-9, s"top eig ${eig(0)} < best axis variance $axisVar")
  }

  test("fit is bit-deterministic (integer-nano moment sums)") {
    val (m1, b1, e1) = Similarity.pcaFit(spark, TestSpark.sf, k = 3)
    val (m2, b2, e2) = Similarity.pcaFit(spark, TestSpark.sf, k = 3)
    assert(m1.toSeq == m2.toSeq && e1.toSeq == e2.toSeq)
    assert(b1.map(_.toSeq).toSeq == b2.map(_.toSeq).toSeq)
  }

  test("projection entry: one row per vector, k columns, deterministic") {
    val p = Similarity.pcaProject(spark, TestSpark.sf, k = 4)
    assert(p.columns.toSeq == Seq("vec_id", "p1", "p2", "p3", "p4"))
    val n = graft.sources.Tables.embeddings(spark, TestSpark.sf).count()
    assert(p.count() == n)
    assert(p.collect().toSeq == Similarity.pcaProject(spark, TestSpark.sf, k = 4).collect().toSeq)
  }
}

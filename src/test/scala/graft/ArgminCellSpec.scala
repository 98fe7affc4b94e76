package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The two zero-expansion argmin forms (plan-literal fold vs
  * broadcast-UDF loop) must be row-wise identical — the UDF is the
  * large-nCells escape hatch for the same Lloyd fit the DuckDB oracle
  * replays, so any divergence would silently split the oracle contract
  * by cell count.
  */
class ArgminCellSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("literal-fold and broadcast-UDF argmin agree on every corpus vector") {
    val corpus = graft.sources.Tables.embeddings(spark, TestSpark.sf)
      .select(col("vec_id").as("n_id"),
        transform(col("embedding"), v => v.cast("double")).as("fv"))
    // centroids drawn from the data itself (duplicates of corpus rows
    // guarantee exact-tie cases: distance 0 to one cell, and equal
    // distances wherever two centroids coincide)
    val cents = corpus.orderBy(col("n_id")).limit(24)
      .collect().map(_.getSeq[Double](1).toArray).toIndexedSeq
    val withDupTies = cents ++ cents.take(4) // identical centroid pairs
    val both = corpus.select(
      Similarity.argminCellLiteral(withDupTies, col("fv")).as("a"),
      Similarity.argminCellUdf(spark, withDupTies, col("fv")).as("b"))
    assert(both.filter(col("a") =!= col("b")).count() == 0)
    // the tie rule is exercised: a duplicated centroid's points must
    // land in the LOWER cell id
    val hit = both.filter(col("a") >= 24).count()
    assert(hit == 0, s"$hit vectors landed in a duplicate (higher-id) cell")
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** E22 — SemDeDup semantic dedup: the within-cell keep rule on planted
  * cells, and the end-to-end IVF-cell path on the real embeddings table.
  */
class SemDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("keep rule: lowest centroid-similarity member of a duplicate trio survives") {
    val dup = Seq(1f, 0f, 0f, 0f)
    val orth = Seq(0f, 1f, 0f, 0f)
    // cell 0: ids 1,2,3 identical (cos=1); c_sim ranks 1 high, 2 and 3
    // tied low -> 2 survives (tie broken on id). id 4 is orthogonal ->
    // untouched. cell 1: id 5 duplicates the trio but sits in another
    // cell -> survives (the rule is cell-scoped by construction).
    val cells = Seq(
      (0, 1L, dup, 0.9), (0, 2L, dup, 0.7), (0, 3L, dup, 0.7),
      (0, 4L, orth, 0.5), (1, 5L, dup, 0.8))
      .toDF("cell", "n_id", "n_emb", "c_sim")
    val survivors = Dedup.semanticDedupWithin(cells, tau = 0.9)
      .select(col("n_id")).as[Long].collect().toSet
    assert(survivors == Set(2L, 4L, 5L))
  }

  test("singleton cells and sub-threshold neighbors are never dropped") {
    val cells = Seq(
      (0, 1L, Seq(1f, 0f, 0f, 0f), 0.9),
      (0, 2L, Seq(0f, 1f, 0f, 0f), 0.7), // same cell, cos=0 < tau
      (1, 3L, Seq(0f, 0f, 1f, 0f), 0.5))
      .toDF("cell", "n_id", "n_emb", "c_sim")
    assert(Dedup.semanticDedupWithin(cells, tau = 0.9).count() == 3)
  }

  test("indexed entry serves identical keep decisions from the memoized IVF index") {
    def keyset(df: org.apache.spark.sql.DataFrame) =
      df.select("n_id", "cell").collect()
        .map(r => (r.getAs[Number]("n_id").longValue, r.getAs[Number]("cell").intValue)).toSet
    val direct = keyset(Dedup.semanticDedup(spark, TestSpark.sf))
    val indexed = keyset(Dedup.semanticDedupIndexed(spark, TestSpark.sf))
    assert(indexed == direct && indexed.nonEmpty)
  }

  test("end-to-end over the embeddings corpus drops planted near-dups, keeps the rest") {
    val corpus = graft.sources.Tables.embeddings(spark, TestSpark.sf)
      .filter(col("vec_id") >= graft.operators.Similarity.nQueries).count()
    val survivors = Dedup.semanticDedup(spark, TestSpark.sf).count()
    assert(survivors > 0 && survivors <= corpus)
    // determinism: the seeded k-means makes the whole path reproducible
    assert(Dedup.semanticDedup(spark, TestSpark.sf).count() == survivors)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.UnigramLm

/** E10e — unigram-LM (SentencePiece-style) tokenizer training. */
class UnigramLmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def writeDocs(path: String, texts: Seq[String]): Unit =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "en", "s") }
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$path/documents.parquet")

  test("EM corpus log-likelihood is non-decreasing; training is deterministic") {
    val (df1, ll1) = UnigramLm.trainWithStats(spark, TestSpark.sf,
      seedSize = 128, vocabTarget = 64, emRounds = 3)
    // EM guarantee (micro-nat quantization gives exact integer sums; a
    // tiny slack covers the prune step between rounds)
    ll1.zip(ll1.tail).foreach { case (a, b) =>
      assert(b >= a - math.abs(a) / 1000, s"LL decreased: $ll1")
    }
    val (df2, ll2) = UnigramLm.trainWithStats(spark, TestSpark.sf,
      seedSize = 128, vocabTarget = 64, emRounds = 3)
    assert(ll1 == ll2)
    assert(df1.collect().toSeq == df2.collect().toSeq)
  }

  test("character coverage survives pruning: every corpus word stays segmentable") {
    val (df, _) = UnigramLm.trainWithStats(spark, TestSpark.sf,
      seedSize = 64, vocabTarget = 40, emRounds = 2)
    val lp = df.select("piece", "prob").as[(String, Double)].collect()
      .map { case (p, pr) => (p, math.log(pr max 1e-12)) }.toMap
    val words = graft.sources.Tables.documents(spark, TestSpark.sf)
      .select(explode(split(col("text"), " ")).as("w")).filter(col("w") =!= "")
      .distinct().as[String].collect()
    words.foreach { w =>
      val seg = UnigramLm.viterbi(w, lp, 6)
      assert(seg.nonEmpty && seg.mkString == w, s"word '$w' not segmentable")
    }
  }

  test("a dominant word emerges as one high-probability piece; viterbi uses it") {
    writeDocs("/tmp/ulm_spec", Seq.fill(30)("tables tables tables chairs") :+ "desk lamp")
    val (df, _) = UnigramLm.trainWithStats(spark, "/tmp/ulm_spec",
      seedSize = 64, vocabTarget = 32, emRounds = 4)
    val pieces = df.select("piece", "prob").as[(String, Double)].collect()
    val lp = pieces.map { case (p, pr) => (p, math.log(pr max 1e-12)) }.toMap
    assert(lp.contains("tables"), "the dominant word should survive as a whole piece")
    assert(UnigramLm.viterbi("tables", lp, 6) == Seq("tables"))
    // fertility beats the char baseline: the model compresses
    val seg = UnigramLm.viterbi("tableschairs", lp, 6)
    assert(seg.nonEmpty && seg.length < "tableschairs".length)
  }

  test("forward-backward expectations: two-segmentation word splits mass, counts bounded") {
    // vocab {a, b, ab}: word "ab" has segmentations [a b] and [ab]
    val third = math.log(1.0 / 3)
    val lp = Map("a" -> third, "b" -> third, "ab" -> third)
    val (cs, ll) = UnigramLm.expectedCounts("ab", lp, 6)
    val m = cs.toMap
    // P([ab]) = 1/3; P([a b]) = 1/9; posterior 3/4 vs 1/4
    assert(math.abs(m("ab") - 0.75) < 1e-9)
    assert(math.abs(m("a") - 0.25) < 1e-9)
    assert(math.abs(m("b") - 0.25) < 1e-9)
    assert(math.abs(ll - math.log(1.0 / 3 + 1.0 / 9)) < 1e-9)
  }
}

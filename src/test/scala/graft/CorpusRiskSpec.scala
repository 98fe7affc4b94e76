package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CorpusRisk

/** E108–E109: duplicated-passage exposure and DoReMi excess-loss
  * weights on planted corpora.
  */
class CorpusRiskSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def writeDocs(path: String, rows: Seq[(Long, String, String, String)]): Unit =
    rows.toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$path/documents.parquet")

  test("dup exposure: shared 8-gram run flags both carriers, unique doc scores zero") {
    // docs 0 and 1 share tokens 1..9 (two 8-grams: 1..8 and 2..9);
    // doc 0 has 10 tokens -> 3 grams, 2 shared; doc 1 has 9 -> 2, both shared
    writeDocs("/tmp/cr_spec1", Seq(
      (0L, "x t1 t2 t3 t4 t5 t6 t7 t8 t9", "en", "s"),
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9", "en", "s"),
      (2L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10", "en", "s")))
    val m = CorpusRisk.dupExposure(spark, "/tmp/cr_spec1").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("n_shared"),
          r.getAs[Long]("exposure_bp")))).toMap
    assert(m(0L) == ((3L, 2L, 6666L)))
    assert(m(1L) == ((2L, 2L, 10000L)))
    assert(m(2L) == ((3L, 0L, 0L)))
  }

  test("dup exposure: short doc (<8 tokens) forms one whole-doc gram") {
    writeDocs("/tmp/cr_spec2", Seq(
      (0L, "a b c", "en", "s"),
      (1L, "a b c", "en", "s"),
      (2L, "d e f", "en", "s")))
    val m = CorpusRisk.dupExposure(spark, "/tmp/cr_spec2").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("exposure_bp")))).toMap
    assert(m(0L) == ((1L, 10000L)))
    assert(m(2L) == ((1L, 0L)))
  }

  test("kn bigram: hand-traced interpolated-KN probabilities, 1-token doc scores NULL") {
    writeDocs("/tmp/cr_spec4", Seq(
      (0L, "a b a b", "en", "s"),
      (1L, "b c", "en", "s"),
      (2L, "x", "en", "s")))
    // bc: (a,b):2 (b,a):1 (b,c):1; B=3; c1: a=(2,1) b=(2,2)
    // n_prec: a=1 b=1 c=1
    def lp(cb: Long, c1: Long, n1f: Long, nPrec: Long): Long =
      math.floor(math.log(
        (cb.toDouble - 0.75) / c1 + (0.75 * n1f) / c1 * (nPrec.toDouble / 3)) * 1e6).toLong
    val lpAB = lp(2, 2, 1, 1) // P(b|a) = 0.75
    val lpBA = lp(1, 2, 2, 1) // P(a|b) = 0.375
    val lpBC = lp(1, 2, 2, 1) // P(c|b) = 0.375
    val m = CorpusRisk.knBigramNll(spark, "/tmp/cr_spec4").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), Option(r.get(2)).map(_.asInstanceOf[Double])))).toMap
    assert(m(0L) == ((3L, Some(-(2 * lpAB + lpBA).toDouble / 1e6 / 3))))
    assert(m(1L) == ((1L, Some(-lpBC.toDouble / 1e6))))
    assert(m(2L) == ((0L, None)))
  }

  test("collocations: planted stuck-together pair tops PMI; floor drops rare pairs") {
    // "left right" co-occur always and only together (6x); filler
    // bigrams repeat but with promiscuous margins
    val planted = Seq.fill(6)("left right").mkString(" f ")
    val filler = Seq.fill(8)("f g f h f g").mkString(" ")
    writeDocs("/tmp/cr_spec5", Seq((0L, planted, "en", "s"), (1L, filler, "en", "s")))
    val rows = graft.operators.CorpusAudit.collocations(spark, "/tmp/cr_spec5")
      .collect()
    assert(rows.nonEmpty)
    val top = rows.head
    assert((top.getAs[String]("w1"), top.getAs[String]("w2")) == (("left", "right")))
    assert(rows.forall(_.getAs[Long]("c_b") >= 5L))
    // PMI descending with deterministic tiebreak
    val keys = rows.map(r => (-r.getAs[Long]("pmi_micro"),
      r.getAs[String]("w1"), r.getAs[String]("w2")))
    assert(keys.sameElements(keys.sorted))
  }

  test("source concentration: hand-computed HHI on a 3:1 two-source corpus") {
    writeDocs("/tmp/cr_spec6", Seq(
      (0L, "a b c d e f", "en", "big"),   // 6 tokens
      (1L, "g h i j k l", "en", "big"),   // 6 tokens
      (2L, "m n o p", "en", "small")))    // 4 tokens
    val r = graft.operators.CorpusAudit.sourceConcentration(spark, "/tmp/cr_spec6")
      .collect().head
    // N=16, shares 12/16 and 4/16 -> HHI = (144+16)/256 = 0.625
    assert(r.getAs[Long]("n_sources") == 2L)
    assert(r.getAs[Long]("n_toks") == 16L)
    assert(r.getAs[Long]("hhi_e6") == 625000L)
    assert(r.getAs[Long]("eff_sources_micro") == 1600000L)
    assert(r.getAs[Long]("top_share_bp") == 7500L)
  }

  test("doremi: off-distribution domain gets positive excess and an upweight over its share") {
    // source "common" speaks the global majority language; source "odd"
    // uses tokens rare globally but uniform within itself -> large
    // proxy-vs-reference gap -> weight/share ratio above common's
    val commonText = Seq.fill(30)("alpha beta gamma delta").mkString(" ")
    writeDocs("/tmp/cr_spec3", Seq(
      (0L, commonText, "en", "common"),
      (1L, commonText, "en", "common"),
      (2L, "zeta eta theta iota kappa zeta eta theta iota kappa", "en", "odd")))
    val rows = CorpusRisk.doremiWeights(spark, "/tmp/cr_spec3").collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_toks"), r.getAs[Long]("excess_mnats"),
          r.getAs[Double]("weight")))).toMap
    val totalToks = rows.values.map(_._1).sum.toDouble
    assert(math.abs(rows.values.map(_._3).sum - 1.0) < 1e-5)
    val (nOdd, excessOdd, wOdd) = rows("odd")
    val (nCommon, _, wCommon) = rows("common")
    assert(excessOdd > 0L)
    assert(wOdd / (nOdd / totalToks) > wCommon / (nCommon / totalToks))
  }

  test("jm interpolation: EM improves held-out NLL monotonically, lambdas stay a distribution") {
    val rows = CorpusRisk.jmInterpolation(spark, TestSpark.sf).collect()
    assert(rows.length == 3)
    assert(rows.map(_.getAs[Long]("iter")).toSeq == Seq(1L, 2L, 3L))
    // iteration 1 runs at the fixed (0.4, 0.4, 0.2) start
    assert(rows.head.getAs[Long]("l1_micro") == 400000L)
    assert(rows.head.getAs[Long]("l3_micro") == 200000L)
    rows.foreach { r =>
      val s = r.getAs[Long]("l1_micro") + r.getAs[Long]("l2_micro") +
        r.getAs[Long]("l3_micro")
      assert(s >= 999997L && s <= 1000000L, s"lambda floors sum $s")
    }
    val nll = rows.map(_.getAs[Long]("heldout_nll_micro"))
    assert(nll.zip(nll.tail).forall { case (a, b) => b <= a },
      s"EM must not worsen held-out NLL: ${nll.toSeq}")
    assert(rows.map(_.getAs[Long]("n_events")).distinct.length == 1)
    // deterministic across invocations (driver-fold lambdas included)
    assert(CorpusRisk.jmInterpolation(spark, TestSpark.sf).collect().toSeq ==
      rows.toSeq)
  }

  test("rho select: domain-fluent-but-globally-rare docs rank first") {
    // 'odd' source speaks its own vocabulary: low global probability,
    // high own-source probability -> large positive excess. 'common'
    // docs reuse corpus-wide tokens -> excess near zero.
    writeDocs("/tmp/cr_rho", Seq(
      (0L, "zq zq zr zr zs zs", "en", "odd"),
      (1L, "zq zr zs zt zu zv", "en", "odd"),
      (2L, "the a of and to in", "en", "common"),
      (3L, "the a of and to in", "en", "common"),
      (4L, "the a of and to in", "en", "common")))
    val rows = CorpusRisk.rhoSelect(spark, "/tmp/cr_rho").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("excess_micro") ==
        r.getAs[Long]("proxy_mnats") - r.getAs[Long]("ref_mnats"))
      assert(r.getAs[Long]("n_toks") == 6L)
    }
    val bySource = rows.map(r => (r.getAs[String]("source"),
      r.getAs[Double]("excess_per_tok")))
    val odd = bySource.filter(_._1 == "odd").map(_._2)
    val common = bySource.filter(_._1 == "common").map(_._2)
    assert(odd.min > common.max,
      s"odd-source docs must outrank common: $odd vs $common")
    // the ordering contract: excess desc, doc_id asc
    val keys = rows.map(r => (-r.getAs[Double]("excess_per_tok"),
      r.getAs[Long]("doc_id")))
    assert(keys.sameElements(keys.sorted))
  }

  test("canary exposure: repeats ladder, exposure bounds, repetition lowers NLL") {
    val rows = CorpusRisk.canaryExposure(spark, TestSpark.sf).collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      val id = r.getAs[Long]("canary_id")
      assert(r.getAs[Long]("repeats") == (1L << (id % 4)).toLong)
      assert(r.getAs[String]("seq").split(" ").length == 6)
      val rank = r.getAs[Long]("rank")
      assert(rank >= 1L && rank <= 65L)
      // exposure = log2(65) - log2(rank), in centibits
      val want = math.floor((math.log(65.0) - math.log(rank.toDouble)) /
        math.log(2.0) * 100).toLong
      assert(r.getAs[Long]("exposure_cb") == want)
    }
    // more insertions -> the planted bigrams' counts rise -> NLL falls:
    // compare group means (per-canary tokens differ, so pairwise
    // monotonicity is not guaranteed, but the 4+8 group must beat 1+2)
    val byRep = rows.map(r => r.getAs[Long]("repeats") -> r.getAs[Long]("nll_micro"))
    def mean(f: Long => Boolean) = {
      val v = byRep.filter(p => f(p._1)).map(_._2); v.sum.toDouble / v.length
    }
    assert(mean(_ >= 4) < mean(_ <= 2),
      s"high-repeat canaries should score lower NLL: ${byRep.toSeq.sorted}")
    // deterministic across invocations
    assert(CorpusRisk.canaryExposure(spark, TestSpark.sf).collect().toSeq ==
      rows.toSeq)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CorpusAudit, LateInteraction}

/** E85–E88: lexicon filter, corpus diff, Heaps' law, MaxSim semantics. */
class CorpusAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def writeDocs(path: String, rows: Seq[(Long, String, String, String)]): Unit =
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$path/documents.parquet")

  test("lexicon filter: weighted hit rate flags the planted doc only") {
    writeDocs("/tmp/ca_spec1", Seq(
      (0L, "slow slow big join", "en", "s1"),     // (3+3+2)/4 = 2.0 -> flagged
      (1L, "join scan filter key table", "en", "s1"))) // 0.0
    val r = CorpusAudit.lexiconFilter(spark, "/tmp/ca_spec1").collect().head
    assert(r.getAs[Long]("n_docs") == 2L)
    assert(r.getAs[Long]("n_flagged") == 1L)
    assert(r.getAs[Double]("max_score") == 2.0)
  }

  test("corpus diff classifies planted add/remove/change/carry") {
    // ids chosen to hit each arm: 3 removed (3%17==3), 0 changed (0%11==0),
    // 5 added-copy (5%23==5, also carried), 1 unchanged
    writeDocs("/tmp/ca_spec2", Seq(
      (0L, "alpha", "en", "s"), (1L, "beta", "en", "s"),
      (3L, "gamma", "en", "s"), (5L, "delta", "en", "s")))
    val d = CorpusAudit.corpusDiff(spark, "/tmp/ca_spec2").collect()
      .map(r => (r.getString(0), r.getAs[Long]("n"))).toMap
    assert(d == Map("added" -> 1L, "removed" -> 1L, "changed" -> 1L, "unchanged" -> 2L))
  }

  test("heaps law: vocab accumulation is monotone and beta lands in (0,1) on real text") {
    val rows = CorpusAudit.heapsLaw(spark, TestSpark.sf).collect()
    assert(rows.length == 10)
    val v = rows.map(_.getAs[Long]("vocab_seen"))
    val t = rows.map(_.getAs[Long]("tokens_seen"))
    assert(v.zip(v.tail).forall { case (a, b) => a <= b })
    assert(t.zip(t.tail).forall { case (a, b) => a < b })
    val beta = rows.head.getAs[Double]("heaps_beta")
    assert(rows.forall(_.getAs[Double]("heaps_beta") == beta))
    // closed 30-word synthetic vocabulary saturates fast: beta small but >0
    assert(beta > 0.0 && beta < 1.0)
  }

  test("maxsim: per-query-token max then sum, hand-traced on a two-doc corpus") {
    writeDocs("/tmp/ca_spec3", Seq(
      (0L, "fast join", "en", "s"), (1L, "scan", "en", "s")))
    val out = LateInteraction.maxSimRerank(spark, "/tmp/ca_spec3")
      .collect().map(r => ((r.getAs[Long]("q_id"), r.getAs[Long]("doc_id")), r.getAs[Long]("score"))).toMap
    // independent scalar replica of the lattice hash
    def dim(tok: String, d: Int): Long = {
      val a = tok.head.toInt; val b = if (tok.length < 2) 0 else tok(1).toInt
      (a * 31 + b * 17 + tok.length * 7 + d * 13) % 19 - 9
    }
    def dot(q: String, t: String): Long = (0 until 4).map(d => dim(q, d) * dim(t, d)).sum
    def maxsim(q: Seq[String], doc: Seq[String]): Long =
      q.map(qt => doc.map(dt => dot(qt, dt)).max).sum
    for ((qid, qtext) <- LateInteraction.queries) {
      val qt = qtext.split(" ").toSeq
      assert(out((qid, 0L)) == maxsim(qt, Seq("fast", "join")))
      assert(out((qid, 1L)) == maxsim(qt, Seq("scan")))
    }
  }

  test("bradley-terry: undefeated source ranks first, winless last; matrix columns exact (E104)") {
    // all-distinct words, no stopwords -> q = ln(n_words+1), monotone in
    // word count; quality order is doc 0 > 1 > ... > 5. Adjacent cross-
    // source matches: doc1(s1) beats doc2(s2), doc3(s2) beats doc4(s3).
    writeDocs("/tmp/ca_bt", Seq(
      (0L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10", "en", "s1"),
      (1L, "v1 v2 v3 v4 v5 v6 v7 v8", "en", "s1"),
      (2L, "u1 u2 u3 u4 u5 u6", "en", "s2"),
      (3L, "t1 t2 t3 t4 t5", "en", "s2"),
      (4L, "r1 r2 r3 r4", "en", "s3"),
      (5L, "p1 p2 p3", "en", "s3")))
    val rows = graft.operators.Preference.bradleyTerry(spark, "/tmp/ca_bt").collect()
    val bySrc = rows.map(r => r.getString(0) ->
      (r.getAs[Long]("wins"), r.getAs[Long]("games"), r.getAs[Long]("strength"),
        r.getAs[Long]("bt_rank"))).toMap
    assert(bySrc("s1") == ((1L, 1L, bySrc("s1")._3, 1L)))
    assert(bySrc("s2") == ((1L, 2L, bySrc("s2")._3, 2L)))
    assert(bySrc("s3") == ((0L, 1L, bySrc("s3")._3, 3L)))
    assert(bySrc("s1")._3 > bySrc("s2")._3 && bySrc("s2")._3 > bySrc("s3")._3)
    // deterministic: a rerun reproduces the fit bit-for-bit
    val again = graft.operators.Preference.bradleyTerry(spark, "/tmp/ca_bt").collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("fim split: sentinel reassembly restores the doc; modes and lengths consistent (E103)") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.operators.Curation.fimSplit(spark, dir).collect()
    val modes = rows.map(_.getAs[String]("mode")).toSet
    assert(modes == Set("psm", "spm", "ar"))
    val orig = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val (id, mode, rend) = (r.getAs[Long]("doc_id"),
        r.getAs[String]("mode"), r.getAs[String]("rendered"))
      val nIn = r.getAs[Long]("n_chars_in"); val nOut = r.getAs[Long]("n_chars_out")
      mode match {
        case "ar" =>
          assert(rend == orig(id) && nOut == nIn)
        case "psm" =>
          val m = "(?s)^<\\|fim_pre\\|>(.*)<\\|fim_suf\\|>(.*)<\\|fim_mid\\|>(.*)$".r
          val m(pre, suf, mid) = rend
          assert(pre + mid + suf == orig(id) && nOut == nIn + 33)
          assert(mid.length == r.getAs[Long]("n_middle"))
        case "spm" =>
          val m = "(?s)^<\\|fim_suf\\|>(.*)<\\|fim_pre\\|>(.*)<\\|fim_mid\\|>(.*)$".r
          val m(suf, pre, mid) = rend
          assert(pre + mid + suf == orig(id) && nOut == nIn + 33)
      }
    }
  }

  test("zipf law: ranks order (freq desc, token asc); slope matches a scalar OLS replica") {
    writeDocs("/tmp/ca_zipf", Seq(
      (0L, "a a a a b b", "en", "s1"),
      (1L, "a b c d", "en", "s2")))
    val rows = CorpusAudit.zipfLaw(spark, "/tmp/ca_zipf").collect()
    val got = rows.map(r => (r.getAs[Long]("rank"), r.getAs[String]("token"),
      r.getAs[Long]("freq")))
    assert(got.toSeq == Seq((1L, "a", 5L), (2L, "b", 3L), (3L, "c", 1L), (4L, "d", 1L)))
    // independent scalar replica of the micro-nat OLS
    val pts = Seq((1L, 5L), (2L, 3L), (3L, 1L), (4L, 1L)).map { case (r, f) =>
      (math.floor(math.log(r.toDouble) * 1e6).toLong,
        math.floor(math.log(f.toDouble) * 1e6).toLong)
    }
    val k = pts.size.toDouble
    val (sx, sy) = (pts.map(_._1).sum.toDouble, pts.map(_._2).sum.toDouble)
    val sxy = pts.map(p => p._1 * p._2).sum.toDouble
    val sxx = pts.map(p => p._1 * p._1).sum.toDouble
    val want = BigDecimal((k * sxy - sx * sy) / (k * sxx - sx * sx))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows.forall(_.getAs[Double]("zipf_slope") == want))
    assert(want < 0.0) // frequency falls with rank
  }

  test("gini lorenz: equal lengths score ~0; planted concentration matches a replica") {
    // four docs of identical length: perfect equality
    writeDocs("/tmp/ca_gini1", (0L until 4L).map(i =>
      (i, "a b c d e", "en", "s")))
    val eq = CorpusAudit.giniLorenz(spark, "/tmp/ca_gini1").collect()
    // n=4: deciles 1-2 cut at rank 0 and match no doc -> 8 rows
    assert(eq.length == 8)
    eq.foreach(r => assert(math.abs(r.getAs[Long]("gini_micro")) <= 1L,
      r.toString)) // two mathematically-equal divisions may differ 1 ulp
    // skewed: lens 1,1,1,7 -> replica of the rank formula
    writeDocs("/tmp/ca_gini2", Seq(
      (0L, "x", "en", "s"), (1L, "y", "en", "s"), (2L, "z", "en", "s"),
      (3L, "a b c d e f g", "en", "s")))
    val lens = Seq(1L, 1L, 1L, 7L) // already ascending with id tiebreak
    val n = 4L; val t = lens.sum
    val a = lens.zipWithIndex.map { case (l, i) => (i + 1) * l }.sum
    val want = math.floor(((2L * a).toDouble / (n * t).toDouble -
      (n + 1).toDouble / n.toDouble) * 1e6).toLong
    val sk = CorpusAudit.giniLorenz(spark, "/tmp/ca_gini2").collect()
    sk.foreach(r => assert(r.getAs[Long]("gini_micro") == want))
    // Lorenz: the shortest 3 of 4 docs (decile >= 8 cut rank 3) hold 3/10
    val d7 = sk.find(_.getAs[Int]("decile") == 7).get
    assert(d7.getAs[Long]("docs_cut") == 2L) // floor(4*7/10) = 2
    val d8 = sk.find(_.getAs[Int]("decile") == 8).get
    assert(d8.getAs[Long]("docs_cut") == 3L &&
      d8.getAs[Long]("share_bp") == 3000L)
  }

  test("winsorized stats: a megadoc moves the raw mean, not the winsorized one") {
    // 20 ordinary 10-char docs + one 1000-char megadoc in source 'm'
    val ordinary = (0L until 20L).map(i =>
      (i, "abcdefghij", "en", if (i < 10) "m" else "o"))
    val mega = Seq((100L, "x" * 1000, "en", "m"))
    writeDocs("/tmp/ca_wins", ordinary ++ mega)
    val rows = CorpusAudit.winsorizedStats(spark, "/tmp/ca_wins").collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val m = rows("m"); val o = rows("o")
    // p95 over 21 docs of {10 x20, 1000} interpolates at 10 -> hi = 10
    assert(m.getAs[Long]("n_clamped_hi") == 1L)
    assert(m.getAs[Long]("winsor_mean_milli") == 10000L) // all clamp to 10
    assert(m.getAs[Long]("raw_mean_milli") == (10L * 10 + 1000L) * 1000 / 11)
    assert(o.getAs[Long]("winsor_mean_milli") == o.getAs[Long]("raw_mean_milli"))
  }

  test("eb shrinkage: tiny extreme source pulls hard toward the corpus rate") {
    // big: 20 docs, 10 flagged (50%); tiny: 2 docs, 2 flagged (100%)
    val big = (0L until 20L).map(i =>
      (i, if (i < 10) "slow join scan" else "join scan key", "en", "big"))
    val tiny = Seq((100L, "slow big table", "en", "tiny"),
      (101L, "big value row", "en", "tiny"))
    writeDocs("/tmp/ca_eb", big ++ tiny)
    val m = CorpusAudit.ebShrinkage(spark, "/tmp/ca_eb").collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("raw_bp"), r.getAs[Long]("shrunk_bp")))).toMap
    val corpusBp = 12L * 10000L / 22L // 12 flagged of 22
    assert(m("big") == ((5000L, m("big")._2)))
    assert(m("tiny")._1 == 10000L)
    // tiny's shrunk rate moves toward the corpus rate MORE than big's
    val moveTiny = (m("tiny")._1 - m("tiny")._2).abs
    val moveBig = (m("big")._1 - m("big")._2).abs
    assert(m("tiny")._2 < 10000L && m("tiny")._2 > corpusBp,
      s"tiny shrunk ${m("tiny")._2} should sit between corpus $corpusBp and raw")
    assert(moveTiny > moveBig,
      s"tiny must shrink more: tiny $moveTiny vs big $moveBig")
  }

  test("good-turing: hand-traced count-of-counts, r*, missing mass, chao1") {
    // trigrams: "a b c" x2, "b c d" x1, "b c e" x1 -> N1=2, N2=1, N=4, V=3
    writeDocs("/tmp/ca_gt", Seq(
      (0L, "a b c d", "en", "s"), (1L, "a b c e", "en", "s")))
    val rows = CorpusAudit.goodTuring(spark, "/tmp/ca_gt").collect()
      .map(r => r.getAs[Long]("r") -> r).toMap
    assert(rows.keySet == Set(1L, 2L))
    val r1 = rows(1L)
    assert(r1.getAs[Long]("n_r") == 2L)
    assert(r1.getAs[Long]("r_star_micro") == 1000000L) // (1+1)*N2/N1 = 1.0
    assert(r1.getAs[Long]("p0_micro") == 500000L)      // N1/N = 2/4
    assert(r1.getAs[Long]("v") == 3L)
    assert(r1.getAs[Long]("chao1") == 3L) // 3 + floor(2*1/(2*2)) = 3
    val r2 = rows(2L)
    assert(r2.getAs[Long]("n_r") == 1L)
    assert(r2.getAs[Long]("r_star_micro") == 0L) // N3 = 0
  }

  test("burstiness: constant term scores 0, single-doc clump scores (n-1)") {
    // 'u' once in each of 4 docs -> variance 0 -> fano 0
    // 'b' 4 times in one doc -> F = (16*4 - 16)/(4*4) = 3
    writeDocs("/tmp/ca_burst", Seq(
      (0L, "u b b b b", "en", "s"), (1L, "u x", "en", "s"),
      (2L, "u y", "en", "s"), (3L, "u z", "en", "s")))
    val m = CorpusAudit.burstiness(spark, "/tmp/ca_burst").collect()
      .map(r => r.getAs[String]("token") ->
        ((r.getAs[Long]("df"), r.getAs[Long]("s1"),
          r.getAs[Long]("fano_micro")))).toMap
    assert(m("u") == ((4L, 4L, 0L)))
    assert(m("b") == ((1L, 4L, 3000000L)))
  }

  test("source jsd: identical distributions score exactly 0") {
    writeDocs("/tmp/ca_jsd1", Seq(
      (0L, "x y", "en", "s1"), (1L, "x y", "en", "s2")))
    val rows = CorpusAudit.sourceJsd(spark, "/tmp/ca_jsd1").collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_toks") == 2L && r.getAs[Long]("n_types") == 2L)
      assert(r.getAs[Long]("jsd_micro") == 0L, r.toString)
    }
  }

  test("source jsd: disjoint equal halves match the hand-computed floor sum") {
    writeDocs("/tmp/ca_jsd2", Seq(
      (0L, "x x", "en", "s1"), (1L, "y y", "en", "s2")))
    // per source: one present token, cs=2, ns=2, c=2, n=4 -> p=1, q=1/2
    val tp = math.floor(1.0 * math.log(2.0 * 1.0 / 1.5) * 5e5).toLong
    val tq = math.floor(0.5 * math.log(2.0 * 0.5 / 1.5) * 5e5).toLong
    val rem = math.floor(math.log(2.0) * (2.0 / 4.0) * 5e5).toLong
    val want = tp + tq + rem
    val rows = CorpusAudit.sourceJsd(spark, "/tmp/ca_jsd2").collect()
    assert(rows.length == 2)
    rows.foreach(r => assert(r.getAs[Long]("jsd_micro") == want, r.toString))
    // bounded by ln 2 (in the folded half-micro-nat scale, ln2 * 1e6)
    assert(want > 0L && want < 693148L)
  }

  test("source jsd on real data: bounded, and every source diverges less than ln 2") {
    val rows = CorpusAudit.sourceJsd(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val j = r.getAs[Long]("jsd_micro")
      assert(j >= -2L && j < 693148L, r.toString) // floor can dip a hair below 0
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Curation

/** E13d2 — boundary-respecting FFD packing invariants. */
class PackingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val seqLen = 512

  private def packed() =
    Curation.sequencePackFfd(spark, TestSpark.sf, seqLen)
      .as[(Long, String, Long, Long, Long)].collect().toSeq

  test("every document is placed exactly once and no non-overflow bin exceeds seqLen") {
    val rows = packed()
    val nDocs = graft.sources.Tables.documents(spark, TestSpark.sf).count()
    assert(rows.map(_._1).distinct.size.toLong == nDocs)
    val fills = rows.groupBy(r => (r._2, r._3, r._4)) // (lang, bkt, bin)
    fills.foreach { case (bin, docs) =>
      val oversize = docs.filter(_._5 > seqLen)
      if (oversize.nonEmpty)
        // an overflow doc sits ALONE in its bin
        assert(docs.size == 1, s"overflow doc shares bin $bin")
      else
        assert(docs.map(_._5).sum <= seqLen, s"bin $bin overflows")
    }
  }

  test("FFD wastes no more capacity than the doc-aligned next-fit baseline") {
    val rows = packed().filter(_._5 <= seqLen)
    val ffdBins = rows.groupBy(r => (r._2, r._3, r._4)).size
    // next-fit baseline replicated per (lang, bkt) group on the same
    // descending order: close the bin whenever the next doc won't fit
    val nfBins = rows.groupBy(r => (r._2, r._3)).map { case (_, docs) =>
      val sizes = docs.sortBy(d => (-d._5, d._1)).map(_._5)
      var bins = 0; var room = 0L
      sizes.foreach { n =>
        if (n > room) { bins += 1; room = seqLen }
        room -= n
      }
      bins
    }.sum
    assert(ffdBins <= nfBins, s"FFD $ffdBins bins > next-fit $nfBins")
  }

  test("deterministic across reruns") {
    assert(packed() == packed())
  }

  test("UniMax allocation: budget conserved, caps respected, uncapped languages uniform (E13f)") {
    val rows = Curation.unimaxMix(TestSpark.spark, "/root/testdata/sf0.001",
      budgetTokens = 12000L, maxEpochs = 4)
      .select("lang", "available_tokens", "cap_tokens", "alloc_tokens", "capped")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    // nothing exceeds its cap; capped rows sit exactly at it
    rows.foreach { case (l, _, cap, a, capped) =>
      assert(a <= cap, l)
      assert(!capped || a == cap, l)
    }
    // total allocation never exceeds the budget, and the leftover is
    // smaller than the uncapped count (pure floor-division remainder) —
    // i.e. the budget is exhausted up to integer quantization whenever
    // some language is uncapped
    val total = rows.map(_._4).sum
    assert(total <= 12000L)
    val uncapped = rows.filter(!_._5)
    if (uncapped.nonEmpty)
      assert(12000L - total < uncapped.length, s"left ${12000L - total}")
    // uniformity: uncapped allocations differ by at most 1 (floor steps)
    if (uncapped.length > 1)
      assert(uncapped.map(_._4).max - uncapped.map(_._4).min <= 1)
    // and no capped language out-draws an uncapped one
    val capped = rows.filter(_._5)
    if (capped.nonEmpty && uncapped.nonEmpty)
      assert(capped.map(_._4).max <= uncapped.map(_._4).min)
  }

  test("context sweep: scalar replica of concat-and-chop crossings and waste") {
    val lens = Map(0L -> 20, 1L -> 30, 2L -> 25, 3L -> 40, 4L -> 10)
    lens.toSeq.map { case (id, n) =>
      (id, Seq.fill(n)("t").mkString(" "), "en", "s")
    }.toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet("/tmp/pack_cs/documents.parquet")
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val order = lens.keys.toSeq.sortBy(id => (md5hex(s"seed42-$id"), id))
    val starts = order.scanLeft(0L)((acc, id) => acc + lens(id)).init
    val total = lens.values.sum.toLong
    val got = Curation.contextSweep(spark, "/tmp/pack_cs").collect()
      .map(r => r.getAs[Long]("l") -> ((r.getAs[Long]("n_chunks"),
        r.getAs[Long]("n_crossing"), r.getAs[Long]("tail_waste")))).toMap
    for (l <- Seq(32L, 64L, 128L, 256L)) {
      val crossing = order.zip(starts).count { case (id, s) =>
        s / l != (s + lens(id) - 1) / l
      }
      val chunks = (total + l - 1) / l
      assert(got(l) == ((chunks, crossing.toLong, chunks * l - total)),
        s"L=$l: got ${got(l)}")
    }
    // the trade the sweep exists to show: larger L never increases
    // boundary crossings on a fixed corpus stream
    val cr = Seq(32L, 64L, 128L, 256L).map(l => got(l)._2)
    assert(cr.zip(cr.tail).forall { case (a, b) => a >= b })
  }

  test("weighted sample: scalar E-S replica; token-weighted bias holds on real data") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long"))
      .as[(Long, Long)].collect()
    def key(id: Long, w: Long): Long = {
      val h48 = java.lang.Long.parseLong(md5hex(s"ws-v1:$id").take(12), 16)
      math.floor(math.log((h48 + 1).toDouble / math.pow(2.0, 48))
        / w.toDouble * 1e9).toLong
    }
    val want = docs.map { case (id, w) => (id, w, key(id, w)) }
      .sortBy(t => (-t._3, t._1)).take(100).toSeq
    val got = Curation.weightedSample(spark, TestSpark.sf)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == want)
    // E-S draws proportional to weight: the sample's mean token count
    // must exceed the corpus mean (long docs over-represented)
    val corpusMean = docs.map(_._2).sum.toDouble / docs.length
    val sampleMean = got.map(_._2).sum.toDouble / got.length
    assert(sampleMean > corpusMean,
      s"sample mean $sampleMean should exceed corpus mean $corpusMean")
  }
}

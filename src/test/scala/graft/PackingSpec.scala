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
}

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
}

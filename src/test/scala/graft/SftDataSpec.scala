package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SftData

/** E105–E107: loss-mask spans, chat-format validation, rejection
  * sampling — hand-traced offsets and independently recomputed
  * winners.
  */
class SftDataSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def writeEvents(path: String,
                          rows: Seq[(Long, Long, String, java.sql.Timestamp, Double)]): Unit =
    rows.toDF("event_id", "user_id", "event_type", "ts", "value")
      .write.mode("overwrite").parquet(s"$path/events.parquet")

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("loss mask: hand-traced offsets, assistant-only spans, exact mask ratio") {
    // user: [click] v=1.00        -> len 20, span 0-20
    // assistant: [purchase] v=2.50 -> len 28, span 21-49  (train)
    // user: [view] v=3.00         -> len 19, span 50-69
    writeEvents("/tmp/sft_spec1", Seq(
      (1L, 1L, "click", ts("2024-01-01 10:00:00"), 1.0),
      (2L, 1L, "purchase", ts("2024-01-01 10:00:01"), 2.5),
      (3L, 1L, "view", ts("2024-01-01 10:00:02"), 3.0)))
    val r = SftData.lossMask(spark, "/tmp/sft_spec1").collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_turns") == 3L)
    assert(row.getAs[Long]("total_chars") == 69L)
    assert(row.getAs[Long]("train_chars") == 28L)
    assert(row.getAs[String]("train_spans") == "21-49")
    assert(row.getAs[Long]("mask_bp") == 28L * 10000L / 69L)
  }

  test("loss mask: a 31-min gap starts a new session and offsets reset") {
    writeEvents("/tmp/sft_spec2", Seq(
      (1L, 5L, "click", ts("2024-01-01 10:00:00"), 1.0),
      (2L, 5L, "purchase", ts("2024-01-01 10:31:01"), 2.0)))
    val r = SftData.lossMask(spark, "/tmp/sft_spec2").collect()
      .map(x => (x.getAs[Long]("session_no"), x.getAs[String]("train_spans")))
    // session 2 holds only the assistant turn: span restarts at 0
    assert(r.toSet == Set((1L, ""), (2L, "0-28")))
  }

  test("chat validate: alternation breaks, assistant-open, no-assistant flags") {
    writeEvents("/tmp/sft_spec3", Seq(
      // user 1: valid user->assistant
      (1L, 1L, "click", ts("2024-01-01 10:00:00"), 1.0),
      (2L, 1L, "error", ts("2024-01-01 10:00:01"), 1.0),
      // user 2: opens with assistant
      (3L, 2L, "purchase", ts("2024-01-01 10:00:00"), 1.0),
      (4L, 2L, "view", ts("2024-01-01 10:00:01"), 1.0),
      // user 3: two consecutive user turns, never an assistant
      (5L, 3L, "click", ts("2024-01-01 10:00:00"), 1.0),
      (6L, 3L, "view", ts("2024-01-01 10:00:01"), 1.0)))
    val m = SftData.chatValidate(spark, "/tmp/sft_spec3").collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_breaks"), r.getAs[Boolean]("opens_assistant"),
          r.getAs[Boolean]("has_assistant"), r.getAs[Boolean]("valid")))).toMap
    assert(m(1L) == ((0L, false, true, true)))
    assert(m(2L) == ((0L, true, true, false)))
    assert(m(3L) == ((1L, false, false, false)))
  }

  test("mlm masks: arm counts reconcile, corruption preserves arity, deterministic") {
    val rows = SftData.mlmMasks(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nToks = r.getAs[Long]("n_toks")
      val nMasked = r.getAs[Long]("n_masked")
      val arms = r.getAs[Long]("n_mask_tok") + r.getAs[Long]("n_random") +
        r.getAs[Long]("n_keep")
      assert(arms == nMasked)
      val corrupted = r.getAs[String]("corrupted").split(" ", -1)
      assert(corrupted.length == nToks)
      assert(corrupted.count(_ == "[MASK]") == r.getAs[Long]("n_mask_tok"))
      val labels = r.getAs[String]("labels")
      assert((if (labels.isEmpty) 0 else labels.split(" ", -1).length) == nMasked)
    }
    // ~15% of positions masked corpus-wide (md5 lottery, +-2% at this N)
    val tot = rows.map(_.getAs[Long]("n_toks")).sum.toDouble
    val masked = rows.map(_.getAs[Long]("n_masked")).sum.toDouble
    assert(math.abs(masked / tot - 0.15) < 0.02)
    val again = SftData.mlmMasks(spark, TestSpark.sf).collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("rejection sample: winner, margin, and floor recomputed independently") {
    def md5grp(id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"rs-v1:$id".getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(2).map("%02x".format(_)).mkString, 16) % 16L
    }
    def q(text: String): Double = {
      val w = text.split(" ", -1)
      val stop = Set("the", "a", "of", "and", "to", "in", "is")
      val v = math.log(w.length + 1.0) * (w.distinct.length.toDouble / w.length) *
        (1.0 - w.count(stop).toDouble / w.length)
      BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta", "en", "s"),
      (1L, "the the the the", "en", "s"),
      (2L, "one two three four five six", "en", "s"),
      (3L, "red green blue", "en", "s"))
    docs.toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet("/tmp/sft_spec4/documents.parquet")
    val got = SftData.rejectionSample(spark, "/tmp/sft_spec4").collect()
      .map(r => (r.getAs[Long]("grp"),
        (r.getAs[Long]("n_candidates"), r.getAs[Long]("best_id"),
          r.getAs[Double]("best_q"), r.getAs[Boolean]("kept")))).toMap
    val exp = docs.groupBy(d => md5grp(d._1)).map { case (g, ds) =>
      val best = ds.maxBy(d => (q(d._2), -d._1))
      g -> ((ds.size.toLong, best._1, q(best._2), q(best._2) >= 1.0))
    }
    assert(got == exp)
  }

  test("answer spans: hand-traced offsets, counts, and context windows") {
    Seq(
      (0L, "merge the merge run", "en", "s"),
      (1L, "vector windowpane", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet("/tmp/sft_spans/documents.parquet")
    val rows = SftData.answerSpans(spark, "/tmp/sft_spans").collect()
    val got = rows.map(r => (r.getAs[String]("term"), r.getAs[Long]("doc_id"),
      r.getAs[Long]("first_pos"), r.getAs[Long]("n_matches"))).toSet
    assert(got == Set(
      ("merge", 0L, 1L, 2L),
      ("vector", 1L, 1L, 1L),
      ("window", 1L, 8L, 1L))) // substring match inside 'windowpane'
    // context clamps at the string head and spans 60 chars max
    rows.foreach { r =>
      assert(r.getAs[String]("context").length <= 60)
      assert(r.getAs[String]("context").contains(r.getAs[String]("term")))
    }
  }

  private def md5Lottery(prefix: String, id: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$prefix$id".getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(2).map("%02x".format(_)).mkString, 16)
  }

  test("tool call audit: truncation lottery replica, valid/in-range splits") {
    val rows = Seq(
      (1L, 10L, "click", ts("2024-01-01 10:00:00"), 12.3),
      (2L, 10L, "click", ts("2024-01-01 10:00:01"), 300.0), // out of range
      (3L, 11L, "purchase", ts("2024-01-01 10:00:02"), 5.0),
      (4L, 11L, "purchase", ts("2024-01-01 10:00:03"), 249.99),
      (5L, 12L, "view", ts("2024-01-01 10:00:04"), 0.01),
      (6L, 12L, "error", ts("2024-01-01 10:00:05"), 100.0),
      (7L, 13L, "signup", ts("2024-01-01 10:00:06"), 1.0),
      (8L, 13L, "signup", ts("2024-01-01 10:00:07"), 260.0)) // out of range
    writeEvents("/tmp/sft_tools", rows)
    val got = SftData.toolCallAudit(spark, "/tmp/sft_tools").collect()
      .map(r => r.getAs[String]("tool") -> ((r.getAs[Long]("n_calls"),
        r.getAs[Long]("n_valid"), r.getAs[Long]("n_truncated"),
        r.getAs[Long]("n_in_range"), r.getAs[Long]("valid_bp")))).toMap
    val exp = rows.groupBy(_._3).map { case (tool, es) =>
      val trunc = es.count(e => md5Lottery("tool-v1:", e._1) % 8L == 0L)
      val valid = es.size - trunc // truncated 25-char prefixes never parse
      val inRange = es.count(e =>
        md5Lottery("tool-v1:", e._1) % 8L != 0L && e._5 >= 0.0 && e._5 < 250.0)
      tool -> ((es.size.toLong, valid.toLong, trunc.toLong, inRange.toLong,
        valid.toLong * 10000L / es.size))
    }
    assert(got == exp)
    // the lottery must have fired somewhere across the id range 1..8 or
    // the truncation arm is untested — widen ids if this ever trips
    assert(exp.values.map(_._3).sum + exp.values.map(_._2).sum == rows.size.toLong)
  }

  test("tool call audit on real data: rates reconcile and truncation ~1/8") {
    val rows = SftData.toolCallAudit(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    var calls = 0L; var trunc = 0L
    rows.foreach { r =>
      val (n, v, t, ir) = (r.getAs[Long]("n_calls"), r.getAs[Long]("n_valid"),
        r.getAs[Long]("n_truncated"), r.getAs[Long]("n_in_range"))
      assert(v == n - t)  // truncation is the only invalidity source
      assert(ir <= v)
      assert(r.getAs[Long]("valid_bp") == v * 10000L / n)
      calls += n; trunc += t
    }
    val rate = trunc.toDouble / calls
    assert(rate > 0.08 && rate < 0.17, s"truncation rate $rate")
  }
}

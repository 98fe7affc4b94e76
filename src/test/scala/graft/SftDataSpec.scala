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
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{EventCorrelation, Privacy, Ltr}

/** C75 EQL sequence, C76 graph explore, C78 HCAD, E94 DP release,
  * C77 LTR — semantics contracts on hand-built rows + the test tables.
  */
class CorrelationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(rows: (Long, Long, String, Long)*) =
    rows.toSeq.toDF("user_id", "event_id", "event_type", "us")

  test("EQL sequence: a clean chain matches with all three timestamps") {
    val out = EventCorrelation.eqlChain(
      ev((1L, 1L, "view", 100L), (1L, 2L, "click", 200L), (1L, 3L, "purchase", 300L)),
      spanUs = 1000L)
      .select(unix_micros(col("t_view")), unix_micros(col("t_click")),
        unix_micros(col("t_purchase"))).as[(Long, Long, Long)].collect()
    assert(out.toSeq == Seq((100L, 200L, 300L)))
  }

  test("EQL sequence: latest-binding — the newest qualifying prefix wins") {
    // two views before the click: the click binds to the LATER view
    val out = EventCorrelation.eqlChain(
      ev((1L, 1L, "view", 100L), (1L, 2L, "view", 150L),
        (1L, 3L, "click", 200L), (1L, 4L, "purchase", 300L)),
      spanUs = 1000L)
      .select(unix_micros(col("t_view"))).as[Long].collect()
    assert(out.toSeq == Seq(150L))
  }

  test("EQL sequence: maxspan bounds the WHOLE chain, and order is strict") {
    // chain spans 10_000 us > 900 span: no match even though each gap is small
    val wide = EventCorrelation.eqlChain(
      ev((1L, 1L, "view", 0L), (1L, 2L, "click", 500L), (1L, 3L, "purchase", 10000L)),
      spanUs = 900L)
    assert(wide.count() == 0)
    // purchase before the click completes nothing; out-of-order never matches
    val disordered = EventCorrelation.eqlChain(
      ev((1L, 1L, "click", 100L), (1L, 2L, "view", 200L), (1L, 3L, "purchase", 300L)),
      spanUs = 1000L)
    assert(disordered.count() == 0)
  }

  test("EQL sequence: every completing purchase emits (non-consuming), keys are independent") {
    val out = EventCorrelation.eqlChain(
      ev((1L, 1L, "view", 100L), (1L, 2L, "click", 200L),
        (1L, 3L, "purchase", 300L), (1L, 4L, "purchase", 400L),
        (2L, 5L, "view", 100L), (2L, 6L, "purchase", 200L)),
      spanUs = 1000L)
    // user 1: both purchases close over the same (view, click) prefix;
    // user 2 has no click so no match
    assert(out.select("user_id").as[Long].collect().toSeq == Seq(1L, 1L))
  }

  test("graph explore: hop 0 is exactly the seed set; hops partition users") {
    val g = EventCorrelation.graphExplore(spark, TestSpark.sf).collect()
    val hop0 = g.find(_.getLong(0) == 0L).get
    // seeds are the user_id % 53 == 0 purchasers: first seed is user 0
    assert(hop0.getLong(2) % 53 == 0 && hop0.getLong(3) % 53 == 0)
    // hop labels are first-reach: total across hops never double-counts
    val total = g.map(_.getLong(1)).sum
    val purchasers = graft.sources.Tables.events(spark, TestSpark.sf)
      .filter(col("event_type") === "purchase")
      .select(countDistinct(col("user_id"))).as[Long].head()
    assert(total <= purchasers)
  }

  test("DP release: noise is bounded, deterministic, and counts never go negative") {
    val a = Privacy.dpCounts(spark, TestSpark.sf).collect()
    val b = Privacy.dpCounts(spark, TestSpark.sf).collect()
    assert(a.toSeq == b.toSeq) // replay-deterministic release
    val truth = graft.sources.Tables.events(spark, TestSpark.sf)
      .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    a.foreach { r =>
      val noisy = r.getLong(2)
      val n = truth((r.getString(0), r.getString(1)))
      assert(noisy >= 0L)
      assert(math.abs(noisy - n) <= 12L, s"noise beyond clamp: $n -> $noisy")
    }
  }

  test("LTR: rank is dense over the model score and features are logged") {
    val out = Ltr.ltrRescore(spark, TestSpark.sf).collect()
    assert(out.nonEmpty && out.length <= 20)
    val scores = out.map(_.getAs[Double]("ltr_score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // the model is the pinned linear form of the logged features
    out.foreach { r =>
      val expect = BigDecimal(
        r.getAs[Double]("f_bm25") * 1.0 + r.getAs[Long]("f_matched") * 0.5 +
          r.getAs[Long]("f_phrase") * 0.75 + r.getAs[Double]("f_dlnorm") * -0.1)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("ltr_score") - expect) < 1e-9)
    }
  }

  test("HCAD: flagged entity-days exceed their own entity's mean, not the global one") {
    val out = EventCorrelation.hcadAnomalies(spark, TestSpark.sf).collect()
    out.foreach { r =>
      assert(r.getAs[Long]("n").toDouble > r.getAs[Double]("mean_n"))
      assert(r.getAs[Long]("n_days") >= 14L)
    }
  }

  test("benford audit: hand-planted digits, exact shares, benford constants (E129)") {
    Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "click", 1.23),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 10:00:01"), 1L, "view", 0.05),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 10:00:02"), 2L, "click", 25.00),
      (4L, java.sql.Timestamp.valueOf("2024-01-01 10:00:03"), 2L, "error", 0.99),
      (5L, java.sql.Timestamp.valueOf("2024-01-01 10:00:04"), 3L, "view", 1.00))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet("/tmp/corr_benford/events.parquet")
    val m = graft.operators.Stats.benfordAudit(spark, "/tmp/corr_benford")
      .collect().map(r => r.getAs[Long]("digit") ->
        ((r.getAs[Long]("n_d"), r.getAs[Long]("share_bp"),
          r.getAs[Long]("benford_bp")))).toMap
    // cents: 123->1, 5->5, 2500->2, 99->9, 100->1
    assert(m.keySet == Set(1L, 2L, 5L, 9L))
    assert(m(1L) == ((2L, 4000L, 3010L))) // log10(2)=0.30103 -> 3010
    assert(m(2L)._1 == 1L && m(2L)._3 == 1760L) // log10(1.5)
    assert(m(9L)._3 == 457L)                    // log10(10/9)
    // expected shares are a distribution (floors sum just under 10000)
    val allB = (1L to 9L).map(d =>
      math.floor(math.log10(1.0 + 1.0 / d) * 10000).toLong).sum
    assert(allB >= 9991L && allB <= 10000L) // 9 floors lose < 9 bp total
  }

  test("robust trend: planted monotone revenue detects 'increasing' with exact S (C79)") {
    // 24 strictly rising months: S = C(24,2) = 276, no ties
    (1 to 24).map { m =>
      val mm = f"${(m - 1) % 12 + 1}%02d"
      val yy = 2020 + (m - 1) / 12
      (m.toLong, java.sql.Date.valueOf(s"$yy-$mm-15"), m * 100.0)
    }.toDF("o_orderkey", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet("/tmp/corr_trend/orders.parquet")
    val r = graft.operators.PipelineAggs.trendRobust(spark, "/tmp/corr_trend")
      .collect().head
    assert(r.getAs[Long]("n_months") == 24L)
    assert(r.getAs[Long]("s_stat") == 276L)
    // var18 = n(n-1)(2n+5) with zero tie correction
    assert(r.getAs[Long]("var18") == 24L * 23L * 53L)
    assert(r.getAs[String]("trend") == "increasing")
    // Theil-Sen on a perfect line y = 10000*x cents recovers the slope
    assert(math.abs(r.getAs[Double]("theil_sen_cents") - 10000.0) < 1e-6)
  }
}

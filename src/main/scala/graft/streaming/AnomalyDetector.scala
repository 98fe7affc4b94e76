package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.plans.IsoForest
import graft.sources.Tables

/** C49e… C29s — STREAMING anomaly detection with model state (SURVEY
  * missing-list item: the RCF-class detector the OpenSearch Anomaly
  * Detection plugin wires onto unified-log indexes; reference anchor:
  * README:312's Discover workflows are what users attach AD monitors
  * to).
  *
  * Shape (the random-cut-forest recipe, served by the isolation-forest
  * kernel F-family already in `plans/IsoForest`, public anchor: Liu et
  * al. 2008; Guha et al. 2016 "Robust random cut forest based anomaly
  * detection on streams" for the streaming protocol):
  *
  *  - the metric stream is keyed by detector entity (per event_type
  *    here; per host/service in production — AD's "HC detector" runs
  *    one model per entity exactly like one GroupState per key);
  *  - each point extends a SHINGLE of the last `shingle` values — the
  *    time-series-to-vector embedding RCF uses, so level shifts AND
  *    shape breaks isolate, not just single-point outliers;
  *  - per-key state carries a bounded reservoir of the most recent
  *    `psi` NORMAL shingles (flagged anomalies are not admitted — an
  *    absorbed anomaly would mask its successors) plus the raw tail;
  *    state is O(psi · shingle) doubles per key, safe at any entity
  *    cardinality;
  *  - the forest REFITS from the reservoir snapshot at each
  *    micro-batch start (periodic refit: the model follows drift
  *    batch-over-batch but scores within a batch are judged against
  *    the PAST only — no self-masking inside a batch); the forest
  *    itself is rebuilt, never serialized into state, so the state
  *    encoder stays primitive arrays;
  *  - seeded per-key fit + fixed tie rules ⇒ byte-identical replays.
  *
  * The batch-replay arm feeds the SAME `step` core with pseudo-batches
  * of `chunk` points, so a micro-batch-for-micro-batch streaming run
  * (StreamingSpec drives one with MemoryStream) produces EXACTLY the
  * replay's rows — the parity the ☆ entry's spec pins. Replay groups
  * one key's full series into one task (fine for bounded per-entity
  * series; the streaming arm is the unbounded-series path).
  */
object AnomalyDetector {

  case class MetricPoint(key: String, seq: Long, value: Double)
  case class AnomalyOut(key: String, seq: Long, value: Double,
                        score: Double, trained: Boolean, is_anomaly: Boolean)
  case class DetectorState(tail: Seq[Double], reservoir: Seq[Seq[Double]])

  case class Config(shingle: Int = 4, psi: Int = 256, nTrees: Int = 48,
                    minTrain: Int = 32, threshold: Double = 0.65)

  /** Out-of-envelope displacement term — the piece of RCF's scoring
    * that a fit-time isolation forest lacks: Liu-style trees draw
    * split candidates from the fitted SAMPLE's range, so a point far
    * OUTSIDE that range follows the same path as the sample max and
    * barely registers (a 500 spike over a 10±0.3 series scored ~0.55).
    * RCF instead measures displacement ON INSERT: the new point
    * extends the bounding box, the cut is drawn over the extended
    * box, and an overhanging point is isolated by the FIRST cut with
    * probability  P = Σ_d out_d / Σ_d (span_d + out_d)  (dim chosen
    * ∝ extended span, cut lands in the overhang with prob
    * out_d/(span_d+out_d)). Expected insert depth ≈ 1/P (geometric),
    * so the same 2^(−E[h]/c(ψ)) normalization applies. In-envelope
    * points have P = 0 and fall through to the forest — this term
    * ONLY restores the sensitivity the streaming protocol requires
    * for range-breaking anomalies.
    */
  private def envelopeScore(x: Array[Double], lo: Array[Double],
                            hi: Array[Double], cPsi: Double): Double = {
    var outSum = 0.0
    var extSum = 0.0
    var d = 0
    while (d < x.length) {
      val out = math.max(0.0, math.max(lo(d) - x(d), x(d) - hi(d)))
      outSum += out
      extSum += (hi(d) - lo(d)) + out
      d += 1
    }
    if (outSum <= 0.0 || extSum <= 0.0) 0.0
    else math.pow(2.0, -(extSum / outSum) / cPsi) // depth ≈ 1/P = ext/out
  }

  /** One pseudo-/micro-batch of one key's points against the state:
    * fit once from the reservoir snapshot, score every completed
    * shingle (forest ∨ envelope displacement), admit normal shingles
    * back into the bounded reservoir. Both arms (streaming fn, batch
    * replay fold) call exactly this.
    */
  def step(cfg: Config, key: String, st: DetectorState,
           points: Seq[MetricPoint]): (DetectorState, Seq[AnomalyOut]) = {
    val forest =
      if (st.reservoir.size >= cfg.minTrain)
        Some(IsoForest.fit(st.reservoir.map(_.toArray).toArray,
          nTrees = cfg.nTrees, psi = cfg.psi))
      else None
    val (lo, hi) = if (forest.isDefined) {
      val dims = cfg.shingle
      val l = Array.fill(dims)(Double.MaxValue)
      val h = Array.fill(dims)(Double.MinValue)
      st.reservoir.foreach { s =>
        var d = 0
        s.foreach { v => if (v < l(d)) l(d) = v; if (v > h(d)) h(d) = v; d += 1 }
      }
      (l, h)
    } else (Array.empty[Double], Array.empty[Double])
    var tail = st.tail
    var res = st.reservoir
    val out = Seq.newBuilder[AnomalyOut]
    points.sortBy(_.seq).foreach { p =>
      tail = (tail :+ p.value).takeRight(cfg.shingle)
      if (tail.size == cfg.shingle) {
        val x = tail.toArray
        val (score, trained) = forest match {
          case Some(f) =>
            val s = math.max(f.score(x),
              envelopeScore(x, lo, hi, f.cOf(st.reservoir.size)))
            (math.round(s * 1e6) / 1e6, true)
          case None => (0.0, false)
        }
        val anomalous = trained && score > cfg.threshold
        out += AnomalyOut(key, p.seq, p.value, score, trained, anomalous)
        if (!anomalous) res = (res :+ (tail: Seq[Double])).takeRight(cfg.psi)
      }
    }
    (DetectorState(tail, res), out.result())
  }

  def detectorFn(cfg: Config)(key: String, points: Iterator[MetricPoint],
                              state: GroupState[DetectorState]): Iterator[AnomalyOut] = {
    val (next, out) = step(cfg, key,
      state.getOption.getOrElse(DetectorState(Nil, Nil)), points.toSeq)
    state.update(next)
    out.iterator
  }

  /** Streaming arm: per-key model state over an unbounded metric
    * stream; Append mode (scored points are immutable once emitted).
    */
  def anomalyStream(spark: SparkSession, points: Dataset[MetricPoint],
                    cfg: Config = Config()): Dataset[AnomalyOut] = {
    import spark.implicits._
    points.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        detectorFn(cfg))
  }

  /** Batch replay of a bounded series through the SAME step core, in
    * pseudo-batches of `chunk` points — deterministic stand-in for a
    * micro-batch streaming run (exact parity when batch boundaries
    * match, which StreamingSpec pins).
    */
  def replay(spark: SparkSession, points: Dataset[MetricPoint],
             cfg: Config = Config(), chunk: Int = 512): Dataset[AnomalyOut] = {
    import spark.implicits._
    points.groupByKey(_.key).flatMapGroups { (key, it) =>
      val chunks = it.toSeq.sortBy(_.seq).grouped(chunk)
      var st = DetectorState(Nil, Nil)
      chunks.flatMap { c =>
        val (next, out) = step(cfg, key, st, c)
        st = next
        out
      }
    }
  }

  /** ☆ `q_anomaly_stream` — replay the events table per event_type in
    * event-time order and report per-key detector telemetry (totals
    * keep the dump small and deterministic; the point-level contract
    * lives in the parity + planted-anomaly specs). no_oracle: DuckDB
    * cannot replicate the seeded forest; OutlierSpec-grade semantics
    * specs cover it.
    */
  def anomalyStreamReplay(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pts = Tables.events(spark, dir)
      .select(col("event_type").as("key"),
        // event-time replay order; event_id breaks timestamp ties
        col("event_id").as("seq"), col("value"))
      .as[MetricPoint]
    replay(spark, pts)
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n_scored"),
        sum(when(col("trained"), 1L).otherwise(0L)).as("n_trained"),
        sum(when(col("is_anomaly"), 1L).otherwise(0L)).as("n_anomalies"),
        round(avg(when(col("trained"), col("score"))), 6).as("mean_score"))
      .orderBy(col("key"))
  }
}

package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** E70 — STREAMING distribution-drift monitor (the ingest-time face of
  * E29's batch PSI audit: a pipeline feeding a training corpus wants
  * to know the moment a source's value distribution walks away from
  * the reference, not at the next batch audit).
  *
  * Shape: the reference histogram (shares per fixed bucket edges) is
  * fit OFFLINE and arrives as literals — the stream side needs ONE
  * watermarked windowed aggregation whose per-bucket counts are
  * conditional sums (a single stateful operator; chaining two
  * stateful aggs is unsupported in streaming, which is why the
  * histogram is not a groupBy(bucket) pass), followed by a STATELESS
  * projection computing
  *   PSI = Σ_i (p_i − r_i) · ln(p_i / r_i)
  * with ε-floored shares (the standard guard for empty buckets).
  * State is O(windows × buckets) — bounded by the watermark horizon,
  * independent of event volume.
  */
object DriftMonitor {

  val epsilon = 1e-4

  /** Bucket index expression for fixed edges: value < e₀ → 0, …,
    * ≥ last edge → edges.size.
    */
  private def bucketOf(value: Column, edges: Seq[Double]): Column =
    edges.zipWithIndex.foldRight(lit(edges.size)) { case ((e, i), acc) =>
      when(value < e, i).otherwise(acc)
    }

  /** Windowed PSI vs the reference shares. `refShares` must have
    * edges.size + 1 entries summing to 1.
    */
  def psiStream(events: DataFrame, edges: Seq[Double],
                refShares: Seq[Double], windowLen: String = "10 minutes",
                watermark: String = "10 minutes",
                threshold: Double = 0.2): DataFrame = {
    require(refShares.size == edges.size + 1, "one share per bucket")
    val b = bucketOf(col("value"), edges)
    val counts = (0 to edges.size).map(i =>
      sum(when(b === i, 1L).otherwise(0L)).as(s"c$i"))
    val agg = events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("win"))
      .agg(counts.head, counts.tail: _*)
    val total = (0 to edges.size).map(i => col(s"c$i")).reduce(_ + _)
    val psi = (0 to edges.size).map { i =>
      val p = greatest(col(s"c$i").cast("double") / total, lit(epsilon))
      val r = lit(math.max(refShares(i), epsilon))
      (p - r) * log(p / r)
    }.reduce(_ + _)
    agg.select(col("win.start").as("window_start"),
        total.as("n"), round(psi, 6).as("psi"))
      .withColumn("drifted", col("psi") > threshold)
  }
}

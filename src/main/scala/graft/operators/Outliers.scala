package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.plans.IsoForest
import graft.sources.Tables

/** E33 — isolation-forest outlier scoring (SURVEY §2). Training-data
  * curation's model-free outlier filter (and the isolation family
  * behind OpenSearch's anomaly-detection plugin): events whose
  * (value, hour, day-of-week) isolate in few random splits are
  * anomalous — fraud-shaped values at odd hours surface without any
  * labeled data or distribution assumption.
  *
  * Scale shape: the FIT is driver-side over a bounded deterministic
  * sample BY DESIGN (the paper's ψ=256 subsample per tree — larger
  * fit sets measurably hurt isolation quality, so this is not a scale
  * concession); the SCORE is a native expression carrying the
  * few-KB forest to every task — one codegen'd projection over the
  * full table, no shuffle until the final top-k TakeOrdered.
  */
object Outliers {

  private def featuresCol = array(
    col("value"),
    hour(col("ts")).cast("double"),
    dayofweek(col("ts")).cast("double"))

  /** ☆ `q_outlier_scores` — the k most anomalous events. Seeded fit +
    * rounded scores + id tiebreak: deterministic across runs/JVMs.
    */
  def outlierScores(spark: SparkSession, dir: String, k: Int = 20,
                    sampleCap: Int = 4096): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), featuresCol.as("fx"))
    // deterministic spread sample: every Nth event_id, N sized from the
    // table count (one count job; the collect is ≤ sampleCap rows)
    val n = ev.count()
    val stride = math.max(1L, n / sampleCap)
    val sample = ev.filter(pmod(col("event_id"), lit(stride)) === 0)
      .orderBy(col("event_id")).limit(sampleCap)
      .select(col("fx")).collect()
      .map(_.getSeq[Double](0).toArray)
    val forest = IsoForest.fit(sample)
    ev.select(col("event_id"),
        round(IsoForest.scoreColumn(col("fx"), forest), 6).as("score"))
      .orderBy(col("score").desc, col("event_id"))
      .limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(
          col("score").desc, col("event_id"))).cast("long"))
  }
}

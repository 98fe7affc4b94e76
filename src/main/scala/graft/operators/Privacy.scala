package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** E94 — differentially-private aggregate release: event counts by
  * (event_type, month) with discrete-Laplace (two-sided geometric)
  * noise, the geometric mechanism of Ghosh–Roughgarden–Sundararajan
  * 2009 (ε-DP for count queries of sensitivity 1; the mechanism the
  * discrete-Gaussian literature, Canonne et al. 2020, benchmarks
  * against). The governance face of the curation tier next to E92
  * k-anonymity: what a pipeline may PUBLISH about a private corpus.
  *
  * Engineering the noise for a distributed, re-runnable engine — the
  * interesting part: noise must be (a) per-release deterministic so
  * retries/replays of a 1000-executor job agree, (b) identical across
  * engines bit-for-bit. So the uniform draw is the md5-lottery (the
  * C71c device): u = first 15 hex digits of md5(salt ‖ group-key) as
  * an integer in [0, 16^15), and the inverse-CDF of the two-sided
  * geometric is materialized as INLINE INTEGER THRESHOLDS — the CDF
  * is computed once at plan-build time and embedded as literals in
  * both the Spark plan and the oracle SQL, so no transcendental
  * function ever evaluates per-row in either engine (a ulp divergence
  * in exp/ln across libms is exactly what would break parity).
  * Per-row cost is one md5 + a 25-arm integer CASE, fully codegen'd;
  * the aggregate itself is one map-side-combined shuffle.
  *
  * ε = 0.5 per release (p = e^-ε); tails clamp at ±12 where the
  * residual mass is ~9e-4 per side; released counts floor at 0.
  */
object Privacy {

  private val Eps = 0.5
  private val P = math.exp(-Eps)
  private val Clamp = 12
  /** 16^15 — the md5-lottery modulus. */
  private val M = BigDecimal("1152921504606846976")

  /** F(k) of the two-sided geometric: p^|k| tails around 0. */
  private def cdf(k: Int): Double =
    if (k < 0) math.pow(P, -k) / (1 + P)
    else 1.0 - math.pow(P, k + 1) / (1 + P)

  /** (k, floor(F(k)·16^15)) for k in [-Clamp, Clamp): noise(u) = the
    * smallest k with u < threshold(k), else +Clamp. Literal source of
    * truth for BOTH engines.
    */
  private val thresholds: Seq[(Int, Long)] =
    (-Clamp until Clamp).map { k =>
      k -> (BigDecimal(cdf(k)) * M).setScale(0, BigDecimal.RoundingMode.FLOOR).toLong
    }

  private def noiseCol(u: Column): Column =
    thresholds.foldRight(lit(Clamp): Column) { case ((k, t), tail) =>
      when(u < t, k).otherwise(tail)
    }

  private def noiseSqlCase(u: String): String =
    thresholds.map { case (k, t) => s"WHEN $u < $t THEN $k" }
      .mkString("CASE ", " ", s" ELSE $Clamp END")

  def dpCounts(spark: SparkSession, dir: String): DataFrame = {
    val u = conv(substring(md5(concat(lit("dp-v1:"), col("event_type"),
      lit(":"), col("month"))), 1, 15), 16, 10).cast("long")
    Tables.events(spark, dir)
      .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n"))
      .withColumn("noise", noiseCol(u).cast("long"))
      .select(col("event_type"), col("month"),
        greatest(col("n") + col("noise"), lit(0L)).as("noisy_n"),
        lit(Eps).as("epsilon"))
      .orderBy(col("event_type"), col("month"))
  }

  val dpCountsSql: String = {
    val noise = noiseSqlCase("u")
    s"""WITH g AS (
       |  SELECT event_type, strftime(ts, '%Y-%m') AS month, count(*) AS n
       |  FROM events GROUP BY 1, 2),
       |drawn AS (
       |  SELECT *,
       |    ('0x' || substr(md5('dp-v1:' || event_type || ':' || month), 1, 15))::BIGINT AS u
       |  FROM g)
       |SELECT event_type, month,
       |  CAST(greatest(n + ($noise), 0) AS BIGINT) AS noisy_n,
       |  $Eps AS epsilon
       |FROM drawn
       |ORDER BY event_type, month""".stripMargin
  }
}

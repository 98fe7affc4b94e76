package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Remaining OpenSearch metric-aggregation family members (SURVEY §2
  * C5d–C5g): weighted_avg, boxplot, t_test, rate. All one- or two-pass
  * conditional/percentile aggregates — map-side combined, one tiny
  * shuffle, no windows — so each streams at any scale.
  */
object Stats {

  /** C5d — weighted_avg (OpenSearch `weighted_avg` agg): Σ(v·w)/Σ(w)
    * per group, with a deterministic per-row sample weight. One
    * map-side-combined aggregate.
    */
  def weightedAvg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("w", (col("user_id") % 5 + 1).cast("double"))
      .groupBy(col("event_type"))
      .agg(
        round(sum(col("value") * col("w")) / sum(col("w")), 4).as("wavg"),
        round(avg(col("value")), 4).as("avg"))
      .orderBy(col("event_type"))

  val weightedAvgSql: String =
    """SELECT event_type,
      |  round(sum(value * CAST(user_id % 5 + 1 AS DOUBLE))
      |        / sum(CAST(user_id % 5 + 1 AS DOUBLE)), 4) AS wavg,
      |  round(avg(value), 4) AS avg
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** C5e — boxplot (OpenSearch `boxplot` agg): min/q1/median/q3/max +
    * IQR per group. Exact linear-interpolation percentiles (the same
    * parity as C5) in ONE aggregate pass.
    */
  def boxplot(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        round(min(col("value")), 4).as("vmin"),
        round(expr("percentile(value, 0.25)"), 4).as("q1"),
        round(expr("percentile(value, 0.5)"), 4).as("q2"),
        round(expr("percentile(value, 0.75)"), 4).as("q3"),
        round(max(col("value")), 4).as("vmax"),
        round(expr("percentile(value, 0.75) - percentile(value, 0.25)"), 4).as("iqr"))
      .orderBy(col("event_type"))

  val boxplotSql: String =
    """SELECT event_type,
      |  round(min(value), 4) AS vmin,
      |  round(quantile_cont(value, 0.25), 4) AS q1,
      |  round(quantile_cont(value, 0.5), 4) AS q2,
      |  round(quantile_cont(value, 0.75), 4) AS q3,
      |  round(max(value), 4) AS vmax,
      |  round(quantile_cont(value, 0.75) - quantile_cont(value, 0.25), 4) AS iqr
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** C5f — t_test (OpenSearch `t_test` agg, Welch's unpaired variant):
    * does the `purchase` cohort's value differ from the `error`
    * cohort's? Closed form from per-cohort (n, mean, sample variance) —
    * one conditional-aggregate pass, one output row; the
    * Welch–Satterthwaite degrees of freedom come from the same four
    * sufficient statistics.
    */
  def tTest(spark: SparkSession, dir: String,
            cohortA: String = "purchase", cohortB: String = "error"): DataFrame = {
    val stats = Tables.events(spark, dir)
      .filter(col("event_type").isin(cohortA, cohortB))
      .groupBy()
      .agg(
        count(when(col("event_type") === cohortA, 1)).cast("double").as("n1"),
        avg(when(col("event_type") === cohortA, col("value"))).as("m1"),
        var_samp(when(col("event_type") === cohortA, col("value"))).as("v1"),
        count(when(col("event_type") === cohortB, 1)).cast("double").as("n2"),
        avg(when(col("event_type") === cohortB, col("value"))).as("m2"),
        var_samp(when(col("event_type") === cohortB, col("value"))).as("v2"))
    val se2 = col("v1") / col("n1") + col("v2") / col("n2")
    stats.select(
      col("n1").cast("long").as("n1"),
      col("n2").cast("long").as("n2"),
      round((col("m1") - col("m2")) / sqrt(se2), 4).as("t"),
      round(se2 * se2 /
        (col("v1") * col("v1") / (col("n1") * col("n1") * (col("n1") - 1)) +
         col("v2") * col("v2") / (col("n2") * col("n2") * (col("n2") - 1))), 4).as("df"))
  }

  val tTestSql: String =
    """WITH s AS (
      |  SELECT
      |    CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS DOUBLE) AS n1,
      |    avg(CASE WHEN event_type = 'purchase' THEN value END) AS m1,
      |    var_samp(CASE WHEN event_type = 'purchase' THEN value END) AS v1,
      |    CAST(count(CASE WHEN event_type = 'error' THEN 1 END) AS DOUBLE) AS n2,
      |    avg(CASE WHEN event_type = 'error' THEN value END) AS m2,
      |    var_samp(CASE WHEN event_type = 'error' THEN value END) AS v2
      |  FROM events WHERE event_type IN ('purchase', 'error'))
      |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
      |  round((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 4) AS t,
      |  round((v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2) /
      |        (v1 * v1 / (n1 * n1 * (n1 - 1)) + v2 * v2 / (n2 * n2 * (n2 - 1))), 4) AS df
      |FROM s""".stripMargin

  /** C2e — adjacency_matrix agg (OpenSearch `adjacency_matrix`):
    * counts for each named filter AND each pairwise intersection, in
    * ONE scan pass — every cell is a conditional aggregate over the
    * same row stream, then `stack` unpivots the single row to
    * (bucket, n) rows. The OpenSearch shape for "how do my segments
    * overlap" without N scans.
    */
  def adjacencyMatrix(spark: SparkSession, dir: String): DataFrame = {
    val a = col("event_type") === "error" // filter a: errors
    val b = col("value") >= 250           // filter b: high-value
    val c = hour(col("ts")) >= 12         // filter c: afternoon
    Tables.events(spark, dir)
      .agg(
        sum(when(a, 1).otherwise(0)).as("na"),
        sum(when(b, 1).otherwise(0)).as("nb"),
        sum(when(c, 1).otherwise(0)).as("nc"),
        sum(when(a && b, 1).otherwise(0)).as("nab"),
        sum(when(a && c, 1).otherwise(0)).as("nac"),
        sum(when(b && c, 1).otherwise(0)).as("nbc"))
      .select(expr(
        "stack(6, 'a', na, 'b', nb, 'c', nc, 'a&b', nab, 'a&c', nac, 'b&c', nbc) AS (bucket, n)"))
      .orderBy(col("bucket"))
  }

  val adjacencyMatrixSql: String =
    """WITH m AS (
      |  SELECT
      |    sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS na,
      |    sum(CASE WHEN value >= 250 THEN 1 ELSE 0 END) AS nb,
      |    sum(CASE WHEN hour(ts) >= 12 THEN 1 ELSE 0 END) AS nc,
      |    sum(CASE WHEN event_type = 'error' AND value >= 250 THEN 1 ELSE 0 END) AS nab,
      |    sum(CASE WHEN event_type = 'error' AND hour(ts) >= 12 THEN 1 ELSE 0 END) AS nac,
      |    sum(CASE WHEN value >= 250 AND hour(ts) >= 12 THEN 1 ELSE 0 END) AS nbc
      |  FROM events)
      |SELECT bucket, CAST(n AS BIGINT) AS n FROM (
      |  SELECT 'a' AS bucket, na AS n FROM m
      |  UNION ALL SELECT 'b', nb FROM m
      |  UNION ALL SELECT 'c', nc FROM m
      |  UNION ALL SELECT 'a&b', nab FROM m
      |  UNION ALL SELECT 'a&c', nac FROM m
      |  UNION ALL SELECT 'b&c', nbc FROM m)
      |ORDER BY bucket""".stripMargin

  /** C2f — multi_terms agg (OpenSearch `multi_terms`): terms over a
    * COMPOSITE key, top-k buckets by doc count. `orderBy().limit()`
    * plans TakeOrderedAndProject — a bounded k-row heap per partition
    * after the one keyed aggregate, never a global sort.
    */
  def multiTerms(spark: SparkSession, dir: String, k: Int = 12): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"), (col("user_id") % 8).as("cohort"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("event_type"), col("cohort"))
      .limit(k)

  val multiTermsSql: String =
    """SELECT event_type, user_id % 8 AS cohort, count(*) AS n
      |FROM events
      |GROUP BY event_type, user_id % 8
      |ORDER BY n DESC, event_type, cohort
      |LIMIT 12""".stripMargin

  /** C5g — rate (OpenSearch `rate` agg): events per day per group,
    * normalized by the group's own active day span (first to last day
    * inclusive). One aggregate pass; the span comes from the same
    * min/max the group already computes.
    */
  def rate(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        (datediff(max(to_date(col("ts"))), min(to_date(col("ts")))) + 1)
          .cast("long").as("days"))
      .select(col("event_type"), col("n"), col("days"),
        round(col("n").cast("double") / col("days"), 4).as("per_day"))
      .orderBy(col("event_type"))

  val rateSql: String =
    """SELECT event_type, count(*) AS n,
      |  CAST(date_diff('day', min(CAST(ts AS DATE)), max(CAST(ts AS DATE))) + 1 AS BIGINT) AS days,
      |  round(CAST(count(*) AS DOUBLE) /
      |        (date_diff('day', min(CAST(ts AS DATE)), max(CAST(ts AS DATE))) + 1), 4) AS per_day
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** C5h — median_absolute_deviation (OpenSearch `median_absolute_
    * deviation` agg, exact flavor): MAD = median(|x − median(x)|) per
    * group. Two grouped exact-percentile passes with the tiny per-group
    * median BROADCAST back between them — the fact table shuffles on
    * the group key twice, never globally. Determinism: quantities are
    * integral doubles, so the interpolated median is x or x+0.5 exactly
    * and deviations stay exact halves — both engines compute identical
    * bits with no quantization needed.
    */
  def mad(spark: SparkSession, dir: String): DataFrame = {
    val q = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_quantity"))
    val med = q.groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_quantity, 0.5)").as("med_qty"))
    q.join(broadcast(med), "l_returnflag")
      .select(col("l_returnflag"), col("med_qty"),
        abs(col("l_quantity") - col("med_qty")).as("dev"))
      .groupBy(col("l_returnflag"))
      .agg(first(col("med_qty")).as("med_qty"),
        expr("percentile(dev, 0.5)").as("mad_qty"))
      .orderBy(col("l_returnflag"))
  }

  val madSql: String =
    """WITH med AS (
      |  SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS med_qty
      |  FROM lineitem GROUP BY 1)
      |SELECT l.l_returnflag, any_value(med_qty) AS med_qty,
      |  quantile_cont(abs(l_quantity - med_qty), 0.5) AS mad_qty
      |FROM lineitem l JOIN med USING (l_returnflag)
      |GROUP BY l.l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** C5i — string_stats (OpenSearch `string_stats` agg with
    * show_distribution's entropy): count, length min/max/avg, and the
    * Shannon entropy of the field's CHARACTER distribution. Lengths
    * aggregate in one pass; entropy needs the per-character counts —
    * a second aggregate over exploded characters, whose key space is
    * the alphabet (bounded), so the explode collapses map-side.
    * Cross-engine floats: each character class's −p·ln(p) term is
    * computed from INTEGER (c, n) identically in both engines and
    * floored to integer micro-nats BEFORE the sum (the unigram-LM
    * playbook) — the final entropy re-derives from that integer sum.
    */
  def stringStats(spark: SparkSession, dir: String, field: String = "event_type"): DataFrame = {
    val vals = Tables.events(spark, dir).select(col(field).as("s"))
    val lens = vals.agg(
      count(lit(1)).as("n_values"),
      min(length(col("s"))).cast("long").as("min_len"),
      max(length(col("s"))).cast("long").as("max_len"),
      (sum(length(col("s"))).cast("double") / count(lit(1))).as("avg_len"))
    // the empty-string filter guards Spark's regex-split trailing
    // artifact; DuckDB's char split never emits one
    val chars = vals.select(explode(split(col("s"), "")).as("ch"))
      .filter(col("ch") =!= "")
      .groupBy(col("ch")).agg(count(lit(1)).as("c"))
    val entropy = chars
      .crossJoin(broadcast(chars.agg(sum(col("c")).as("n"))))
      .select(floor((col("c").cast("double") / col("n")) *
        log(col("n").cast("double") / col("c")) * 1e6).cast("long").as("e_u"))
      .agg((sum(col("e_u")).cast("double") / 1e6).as("entropy"))
    lens.crossJoin(broadcast(entropy))
  }

  val stringStatsSql: String =
    """WITH chars AS (
      |  SELECT ch, count(*) AS c
      |  FROM events, unnest(string_split(event_type, '')) AS t(ch)
      |  GROUP BY ch),
      |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM chars),
      |ent AS (
      |  SELECT CAST(sum(CAST(floor((CAST(c AS DOUBLE) / n) *
      |      ln(CAST(n AS DOUBLE) / c) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000
      |    AS entropy
      |  FROM chars CROSS JOIN tot)
      |SELECT count(*) AS n_values,
      |  CAST(min(len(event_type)) AS BIGINT) AS min_len,
      |  CAST(max(len(event_type)) AS BIGINT) AS max_len,
      |  CAST(sum(len(event_type)) AS DOUBLE) / count(*) AS avg_len,
      |  any_value(entropy) AS entropy
      |FROM events CROSS JOIN ent""".stripMargin
}

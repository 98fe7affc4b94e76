package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** OpenSearch pipeline aggregations (SURVEY §2 C42–C45).
  *
  * OpenSearch's pipeline aggs post-process the BUCKETS of a parent
  * aggregation (date_histogram here), not the raw documents — so every
  * operator below is: one partial-aggregated groupBy down to the
  * day-bucket series, then window/filter arithmetic over that BOUNDED
  * aggregate (≤ days-in-range rows, like C15/C28). The unpartitioned
  * window never sees raw data — at 100 TB the series is still ~365
  * rows/year; the heavy lifting stays in the map-side-combined
  * aggregate below it.
  */
object PipelineAggs {

  private def dailyBuckets(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_err"),
        round(sum(when(col("event_type") === "purchase", col("value"))
          .otherwise(0.0)), 4).as("purchase_value"),
        round(sum(when(col("event_type") === "view", col("value"))
          .otherwise(0.0)), 4).as("view_value"))

  private val dailyBucketsSql: String =
    """SELECT date_trunc('day', ts) AS day, count(*) AS n,
      |    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_err,
      |    round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 4) AS purchase_value,
      |    round(sum(CASE WHEN event_type = 'view' THEN value ELSE 0 END), 4) AS view_value
      |  FROM events GROUP BY 1""".stripMargin

  /** C42 — cumulative_sum: running total over the parent histogram. */
  def cumulativeSum(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dailyBuckets(spark, dir)
      .select(col("day"), col("n"), sum(col("n")).over(w).as("cum_n"))
      .orderBy(col("day"))
  }

  val cumulativeSumSql: String =
    s"""WITH b AS ($dailyBucketsSql)
       |SELECT day, n,
       |  CAST(sum(n) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_n
       |FROM b ORDER BY day""".stripMargin

  /** C43 — serial_diff: lag-k differencing of the bucket series
    * (k=7 strips weekly seasonality); null for the warm-up buckets,
    * exactly as OpenSearch emits no value there.
    */
  def serialDiff(spark: SparkSession, dir: String, lagK: Int = 7): DataFrame = {
    val w = Window.orderBy(col("day"))
    dailyBuckets(spark, dir)
      .select(col("day"), col("n"),
        (col("n") - lag(col("n"), lagK).over(w)).as("diff_n"))
      .orderBy(col("day"))
  }

  val serialDiffSql: String =
    s"""WITH b AS ($dailyBucketsSql)
       |SELECT day, n, n - lag(n, 7) OVER (ORDER BY day) AS diff_n
       |FROM b ORDER BY day""".stripMargin

  /** C44 — bucket_script: a per-bucket metric computed FROM sibling
    * metrics (purchase-to-view value ratio per day); null where the
    * denominator bucket is empty, as the script path does.
    */
  def bucketScript(spark: SparkSession, dir: String): DataFrame =
    dailyBuckets(spark, dir)
      .select(col("day"), col("purchase_value"), col("view_value"),
        when(col("view_value") =!= 0.0,
          round(col("purchase_value") / col("view_value"), 4)).as("pv_ratio"))
      .orderBy(col("day"))

  val bucketScriptSql: String =
    s"""WITH b AS ($dailyBucketsSql)
       |SELECT day, purchase_value, view_value,
       |  CASE WHEN view_value <> 0 THEN round(purchase_value / view_value, 4) END AS pv_ratio
       |FROM b ORDER BY day""".stripMargin

  /** C45 — bucket_selector: drop parent buckets failing a metric
    * predicate (days whose error share clears the alert line). The
    * predicate runs on the aggregated series — a HAVING, not a raw-row
    * filter, so the full day still aggregates before being judged.
    */
  def bucketSelector(spark: SparkSession, dir: String,
                     minErrShare: Double = 0.198): DataFrame =
    dailyBuckets(spark, dir)
      .withColumn("err_share", round(col("n_err").cast("double") / col("n"), 6))
      .filter(col("err_share") >= minErrShare)
      .select(col("day"), col("n"), col("n_err"), col("err_share"))
      .orderBy(col("day"))

  val bucketSelectorSql: String =
    s"""WITH b AS ($dailyBucketsSql)
       |SELECT day, n, n_err, round(CAST(n_err AS DOUBLE) / n, 6) AS err_share
       |FROM b
       |WHERE round(CAST(n_err AS DOUBLE) / n, 6) >= 0.198
       |ORDER BY day""".stripMargin

  /** C45b — moving_fn: arbitrary window functions over the bucket
    * series (OpenSearch's generic replacement for moving_avg). Shown
    * with the two scripts a dashboard actually uses — trailing max and
    * trailing min over a 7-bucket window (order-free stats: no float
    * summation divergence to manage).
    */
  def movingFn(spark: SparkSession, dir: String, window: Int = 7): DataFrame = {
    val w = Window.orderBy(col("day")).rowsBetween(-(window - 1), Window.currentRow)
    dailyBuckets(spark, dir)
      .select(col("day"), col("n"),
        max(col("n")).over(w).as("mov_max"),
        min(col("n")).over(w).as("mov_min"))
      .orderBy(col("day"))
  }

  val movingFnSql: String =
    s"""WITH b AS ($dailyBucketsSql)
       |SELECT day, n,
       |  max(n) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS mov_max,
       |  min(n) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS mov_min
       |FROM b ORDER BY day""".stripMargin

  /** C45c — top_hits: each bucket carries its top documents (here: the
    * 2 highest-value events per event_type, with their fields). Scale
    * shape: rank window partitioned by the BUCKET KEY — per-partition
    * heap depth k, no global sort; ties broken by event_id for a
    * deterministic result set.
    */
  def topHits(spark: SparkSession, dir: String, k: Int = 2): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").desc, col("event_id"))
    Tables.events(spark, dir)
      .withColumn("hit_rank", row_number().over(w))
      .filter(col("hit_rank") <= k)
      .select(col("event_type"), col("hit_rank"), col("event_id"),
        col("user_id"), col("value"))
      .orderBy(col("event_type"), col("hit_rank"))
  }

  val topHitsSql: String =
    """SELECT event_type, hit_rank, event_id, user_id, value
      |FROM (
      |  SELECT event_type, event_id, user_id, value,
      |    row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS hit_rank
      |  FROM events)
      |WHERE hit_rank <= 2
      |ORDER BY event_type, hit_rank""".stripMargin

  /** C45d — sibling bucket aggregations (avg_bucket / min_bucket /
    * max_bucket / sum_bucket / stats_bucket): one scalar summary OVER
    * the parent histogram's bucket metric. The day series is already
    * the bounded aggregate, so the sibling pass is a single-row
    * reduction of ≤ days rows; counts are integers, so the average is
    * one deterministic int/int division — no float-order management
    * needed.
    */
  def bucketStats(spark: SparkSession, dir: String): DataFrame =
    dailyBuckets(spark, dir)
      .agg(
        count(lit(1)).as("n_buckets"),
        sum(col("n")).as("sum_n"),
        min(col("n")).as("min_n"),
        max(col("n")).as("max_n"),
        (sum(col("n")).cast("double") / count(lit(1))).as("avg_n"))

  val bucketStatsSql: String =
    s"""WITH b AS ($dailyBucketsSql)
       |SELECT count(*) AS n_buckets,
       |  CAST(sum(n) AS BIGINT) AS sum_n, min(n) AS min_n, max(n) AS max_n,
       |  CAST(sum(n) AS DOUBLE) / count(*) AS avg_n
       |FROM b""".stripMargin

  /** C45e — bucket_sort: reorder and TRUNCATE the parent's buckets by a
    * sibling metric (the "worst 5 days by error count" dashboard tile).
    * Runs on the bounded day series, and Spark plans orderBy+limit as
    * TakeOrderedAndProject (a top-k heap, no global sort) — the same
    * shape it would keep if the parent series were larger.
    */
  def bucketSort(spark: SparkSession, dir: String, k: Int = 5): DataFrame =
    dailyBuckets(spark, dir)
      .select(col("day"), col("n"), col("n_err"))
      .orderBy(col("n_err").desc, col("day"))
      .limit(k)

  val bucketSortSql: String =
    s"""WITH b AS ($dailyBucketsSql)
       |SELECT day, n, n_err
       |FROM b ORDER BY n_err DESC, day LIMIT 5""".stripMargin

  /** C5j — top_metrics agg (the metric value at the row with the max
    * sort field, per bucket — "the latest reading per host" tile;
    * top_hits returns whole sample documents, top_metrics exactly one
    * scalar). One `max_by` per bucket — a single map-side-combined
    * aggregate, no window, no per-bucket sort. The sort key is the
    * timestamp serialized to a fixed-width string with the unique
    * event_id appended, so selection is total-ordered and both engines
    * pick the identical row even on timestamp ties.
    */
  def topMetrics(spark: SparkSession, dir: String): DataFrame = {
    val sortKey = concat(
      date_format(col("ts"), "yyyyMMddHHmmssSSSSSS"),
      lpad(col("event_id").cast("string"), 12, "0"))
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        max(col("ts")).as("latest_ts"),
        max_by(col("value"), sortKey).as("latest_value"),
        max_by(col("user_id"), sortKey).as("latest_user"))
      .orderBy(col("event_type"))
  }

  val topMetricsSql: String =
    """WITH keyed AS (
      |  SELECT event_type, ts, value, user_id,
      |    concat(strftime(ts, '%Y%m%d%H%M%S%f'),
      |           lpad(CAST(event_id AS VARCHAR), 12, '0')) AS sk
      |  FROM events)
      |SELECT event_type, max(ts) AS latest_ts,
      |  arg_max(value, sk) AS latest_value,
      |  arg_max(user_id, sk) AS latest_user
      |FROM keyed
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** C45f — normalize pipeline agg (percent_of_sum): each parent
    * bucket's share of the series total. The total is a one-row
    * broadcast over the bounded day series; the share divides the
    * bucket's exact integer count by the exact integer total — one
    * correctly-rounded IEEE division per bucket, deterministic
    * cross-engine.
    */
  def normalizeAgg(spark: SparkSession, dir: String): DataFrame = {
    val b = dailyBuckets(spark, dir).select(col("day"), col("n"))
    b.crossJoin(broadcast(b.agg(sum(col("n")).as("total"))))
      .select(col("day"), col("n"),
        (col("n").cast("double") * 100 / col("total")).as("pct_of_sum"))
      .orderBy(col("day"))
  }

  val normalizeAggSql: String =
    s"""WITH b AS ($dailyBucketsSql),
       |tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM b)
       |SELECT day, n, CAST(n AS DOUBLE) * 100 / total AS pct_of_sum
       |FROM b CROSS JOIN tot
       |ORDER BY day""".stripMargin

  /** C45g — moving_percentiles pipeline agg: a trailing-window exact
    * median over the parent histogram's metric (the robust cousin of
    * C15's moving average — outlier days don't drag it). `percentile`
    * runs as a window aggregate over the bounded day series; counts
    * are integers, so the interpolated median is n or n+0.5 exactly —
    * bit-identical cross-engine with no quantization.
    */
  def movingPercentile(spark: SparkSession, dir: String): DataFrame =
    dailyBuckets(spark, dir)
      .withColumn("p50_7d", expr("percentile(n, 0.5)").over(
        Window.orderBy(col("day")).rowsBetween(-6, 0)))
      .select(col("day"), col("n"), col("p50_7d"))
      .orderBy(col("day"))

  val movingPercentileSql: String =
    s"""WITH b AS ($dailyBucketsSql)
       |SELECT day, n,
       |  quantile_cont(n, 0.5) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS p50_7d
       |FROM b
       |ORDER BY day""".stripMargin

  /** C45l — change_point detection (the OpenSearch ML agg: where did
    * the series shift?). Deterministic mean-shift scan: for every
    * split of the day series, the |mean(before) − mean(after)| gap,
    * argmax wins — CUSUM's exhaustive cousin, exact on the bounded
    * aggregate. Cumulative sums come from one window over the ≤days
    * series; every mean divides exact longs, so scores are identical
    * doubles cross-engine and the argmax (day-tiebroken) picks the
    * same split. The raw data contributes one map-side-combined
    * aggregate — the scan never sees the quadratic-looking split loop.
    */
  def changePoint(spark: SparkSession, dir: String): DataFrame = {
    val byDay = Window.orderBy(col("day"))
    val s = dailyBuckets(spark, dir).select(col("day"), col("n"))
      .withColumn("i", row_number().over(byDay).cast("long"))
      .withColumn("cum", sum(col("n")).over(
        byDay.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = s.agg(max(col("i")).as("nd"), sum(col("n")).as("total"))
    s.crossJoin(broadcast(tot))
      .filter(col("i") < col("nd"))
      .select(col("day"),
        (col("cum").cast("double") / col("i")).as("before_mean"),
        ((col("total") - col("cum")).cast("double") / (col("nd") - col("i"))).as("after_mean"))
      .withColumn("shift", abs(col("after_mean") - col("before_mean")))
      .orderBy(col("shift").desc, col("day"))
      .limit(1)
  }

  val changePointSql: String =
    s"""WITH b AS ($dailyBucketsSql),
       |s AS (
       |  SELECT day, n,
       |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i,
       |    CAST(sum(n) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM b),
       |tot AS (SELECT max(i) AS nd, CAST(sum(n) AS BIGINT) AS total FROM s)
       |SELECT day, before_mean, after_mean,
       |  abs(after_mean - before_mean) AS shift
       |FROM (
       |  SELECT day,
       |    CAST(cum AS DOUBLE) / i AS before_mean,
       |    CAST(total - cum AS DOUBLE) / (nd - i) AS after_mean
       |  FROM s CROSS JOIN tot WHERE i < nd)
       |ORDER BY shift DESC, day
       |LIMIT 1""".stripMargin

  /** C45j — cumulative_cardinality pipeline agg (running distinct-user
    * count per day — the "total unique users to date" dashboard line).
    * The naive plan (per-day distinct over an expanding window) re-scans
    * every prefix; the scalable shape is FIRST-SEEN: one groupBy(user)
    * min(day) collapses the fact table to user-cardinality rows, a
    * bounded per-day count of first appearances follows, and the
    * cumulative sum runs over the ≤days series (left-joined onto the
    * full day skeleton so zero-new-user days still emit a bucket).
    */
  def cumulativeCardinality(spark: SparkSession, dir: String): DataFrame = {
    val firstSeen = Tables.events(spark, dir)
      .select(date_trunc("day", col("ts")).as("day"), col("user_id"))
      .groupBy(col("user_id")).agg(min(col("day")).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("new_users"))
    val days = dailyBuckets(spark, dir).select(col("day"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    days.join(firstSeen, Seq("day"), "left")
      .select(col("day"), coalesce(col("new_users"), lit(0L)).as("new_users"))
      .withColumn("cum_users", sum(col("new_users")).over(w))
      .orderBy(col("day"))
  }

  val cumulativeCardinalitySql: String =
    s"""WITH fs AS (
       |  SELECT user_id, min(date_trunc('day', ts)) AS day FROM events GROUP BY 1),
       |perday AS (SELECT day, count(*) AS new_users FROM fs GROUP BY 1),
       |days AS (SELECT DISTINCT date_trunc('day', ts) AS day FROM events)
       |SELECT d.day, coalesce(new_users, 0) AS new_users,
       |  CAST(sum(coalesce(new_users, 0)) OVER (ORDER BY d.day
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
       |FROM days d LEFT JOIN perday p ON d.day = p.day
       |ORDER BY d.day""".stripMargin

  /** C45k — bucket_correlation (the OpenSearch ML `bucket_correlation`
    * pipeline agg): Pearson r between two sibling metric series of the
    * parent histogram (do error counts track traffic?). Both series
    * are integer counts, so all five moment sums are exact longs and
    * the closed-form r — (nΣxy−ΣxΣy)/√((nΣx²−(Σx)²)(nΣy²−(Σy)²)) —
    * computes identical doubles in both engines. One bounded-series
    * aggregate row out.
    */
  def bucketCorrelation(spark: SparkSession, dir: String): DataFrame =
    dailyBuckets(spark, dir)
      .agg(
        count(lit(1)).as("nb"),
        sum(col("n")).as("sx"), sum(col("n_err")).as("sy"),
        sum(col("n") * col("n")).as("sxx"),
        sum(col("n_err") * col("n_err")).as("syy"),
        sum(col("n") * col("n_err")).as("sxy"))
      .select(col("nb"),
        ((col("nb") * col("sxy") - col("sx") * col("sy")).cast("double") /
          sqrt((col("nb") * col("sxx") - col("sx") * col("sx")).cast("double") *
               (col("nb") * col("syy") - col("sy") * col("sy")).cast("double")))
          .as("r"))

  val bucketCorrelationSql: String =
    s"""WITH b AS ($dailyBucketsSql),
       |m AS (
       |  SELECT count(*) AS nb,
       |    CAST(sum(n) AS BIGINT) AS sx, CAST(sum(n_err) AS BIGINT) AS sy,
       |    CAST(sum(n * n) AS BIGINT) AS sxx,
       |    CAST(sum(n_err * n_err) AS BIGINT) AS syy,
       |    CAST(sum(n * n_err) AS BIGINT) AS sxy
       |  FROM b)
       |SELECT nb,
       |  CAST(nb * sxy - sx * sy AS DOUBLE) /
       |    sqrt(CAST(nb * sxx - sx * sx AS DOUBLE) * CAST(nb * syy - sy * sy AS DOUBLE)) AS r
       |FROM m""".stripMargin

  /** C45i — percentiles_bucket + extended_stats_bucket: distribution
    * summaries OVER the parent histogram's bucket metric (which day
    * sizes are typical / how spread out are they). Quartiles are exact
    * percentiles of the ≤days-rows series; the std is derived from
    * exact INTEGER sums (n·Σx² − (Σx)² under one sqrt) rather than a
    * streaming stddev, whose partition-order float accumulation
    * diverges cross-engine.
    */
  def percentilesBucket(spark: SparkSession, dir: String): DataFrame =
    dailyBuckets(spark, dir)
      .agg(
        expr("percentile(n, array(0.25, 0.5, 0.75))").as("ps"),
        count(lit(1)).as("nb"),
        sum(col("n")).as("s1"),
        sum(col("n") * col("n")).as("s2"))
      .select(
        element_at(col("ps"), 1).as("p25"),
        element_at(col("ps"), 2).as("p50"),
        element_at(col("ps"), 3).as("p75"),
        (sqrt((col("nb") * col("s2") - col("s1") * col("s1")).cast("double")) /
          col("nb")).as("std_n"))

  val percentilesBucketSql: String =
    s"""WITH b AS ($dailyBucketsSql),
       |agg AS (
       |  SELECT quantile_cont(n, [0.25, 0.5, 0.75]) AS ps,
       |    count(*) AS nb, CAST(sum(n) AS BIGINT) AS s1,
       |    CAST(sum(n * n) AS BIGINT) AS s2
       |  FROM b)
       |SELECT ps[1] AS p25, ps[2] AS p50, ps[3] AS p75,
       |  sqrt(CAST(nb * s2 - s1 * s1 AS DOUBLE)) / nb AS std_n
       |FROM agg""".stripMargin

  /** C45n — moving_fn holt model (OpenSearch `MovingFunctions.holt`,
    * double-exponential smoothing: a level AND a trend state, so the
    * smoother tracks ramps EWMA lags behind). Model spec, mirrored
    * exactly by the oracle's recursive CTE: l₁=y₁, b₁=0; for t≥2
    * lₜ = α·yₜ + (1−α)(lₜ₋₁+bₜ₋₁), bₜ = β(lₜ−lₜ₋₁) + (1−β)bₜ₋₁;
    * reported value = lₜ + bₜ (the one-step forecast).
    *
    * Spark-first shape: the recursion is a sequential scan over the
    * PARENT-BUCKET series — bucket-count-sized, not row-sized — so it
    * runs as `aggregate` (a codegen'd higher-order fold) over each
    * bucket's running prefix from one unpartitioned window. The prefix
    * re-fold is O(T²) in the number of histogram buckets (dozens), a
    * driver-visible constant at any data scale; the data-sized work
    * remains the one map-side-combined dailyBuckets aggregate. The
    * inputs are exact BIGINT counts and the fold applies the identical
    * fixed-order IEEE chain in both engines (α=0.5, β=0.25 — chosen so both β and 1−β are exact binary fractions and the literals agree cross-engine to the bit), so no
    * summation-order hazard exists — the same determinism device as
    * C45h's EWMA, extended to a stateful recursion.
    */
  def movingHolt(spark: SparkSession, dir: String,
                 alpha: Double = 0.5, beta: Double = 0.25): DataFrame = {
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val st = aggregate(
      col("ys"),
      struct(lit(0.0).as("l"), lit(0.0).as("tr"), lit(0).as("i")),
      (acc, y) => {
        val lPrev = acc.getField("l"); val tPrev = acc.getField("tr")
        val lNew = lit(alpha) * y + lit(1.0 - alpha) * (lPrev + tPrev)
        when(acc.getField("i") === 0,
          struct(y.as("l"), lit(0.0).as("tr"), lit(1).as("i")))
          .otherwise(struct(
            lNew.as("l"),
            (lit(beta) * (lNew - lPrev) + lit(1.0 - beta) * tPrev).as("tr"),
            (acc.getField("i") + 1).as("i")))
      })
    dailyBuckets(spark, dir)
      .withColumn("ys", collect_list(col("n").cast("double")).over(w))
      .withColumn("st", st)
      .select(col("day"), col("n"),
        round(col("st.l") + col("st.tr"), 6).as("holt"))
      .orderBy(col("day"))
  }

  /** C45o — moving_fn holt_winters model (OpenSearch
    * `MovingFunctions.holtWinters`: triple-exponential smoothing —
    * level + trend + additive seasonality, the model dashboards reach
    * for on weekly-patterned series). Model spec, mirrored exactly by
    * the oracle (period m=7; α=0.5, β=γ=0.25 — all with exact binary
    * complements):
    *   init at t=m:  l=mean(y₁..y₇) (exact-int sum ÷ 7), b=0,
    *                 sᵢ = yᵢ − l for i=1..7;
    *   for t>m:      lₜ = α(yₜ−sₜ₋ₘ) + (1−α)(lₜ₋₁+bₜ₋₁),
    *                 bₜ = β(lₜ−lₜ₋₁) + (1−β)bₜ₋₁,
    *                 sₜ = γ(yₜ−lₜ) + (1−γ)sₜ₋ₘ;
    *   reported (t>m): hw = lₜ + sₜ. Warm-up buckets emit nothing,
    *   like C43's serial_diff nulls.
    *
    * Scale shape: the recursion is bucket-count-sized, so the whole
    * series folds ONCE as `aggregate` over the sorted day array (the
    * array is the parent histogram — dozens of rows at any data scale);
    * the seasonal state rides the fold as a 7-slot array, exactly as
    * the recursive CTE carries it. Data-sized work stays in the one
    * map-side-combined dailyBuckets aggregate.
    */
  def movingHoltWinters(spark: SparkSession, dir: String): DataFrame = {
    val m = 7
    val series = dailyBuckets(spark, dir)
      .agg(array_sort(collect_list(struct(col("day"), col("n")))).as("rows"))
    val ys = transform(col("rows"), r => r.getField("n").cast("double"))
    val l0 = aggregate(slice(ys, 1, m), lit(0.0), (a, y) => a + y) / lit(m.toDouble)
    val ss0 = transform(slice(ys, 1, m), y => y - l0)
    val init = struct(l0.as("l"), lit(0.0).as("tr"), ss0.as("ss"),
      array().cast("array<double>").as("out"))
    val fin = aggregate(
      slice(ys, lit(m + 1), greatest(size(ys) - m, lit(0))), init,
      (acc, y) => {
        val sOld = element_at(acc.getField("ss"), 1)
        val lPrev = acc.getField("l"); val tPrev = acc.getField("tr")
        val lNew = lit(0.5) * (y - sOld) + lit(0.5) * (lPrev + tPrev)
        val trNew = lit(0.25) * (lNew - lPrev) + lit(0.75) * tPrev
        val sNew = lit(0.25) * (y - lNew) + lit(0.75) * sOld
        struct(lNew.as("l"), trNew.as("tr"),
          concat(slice(acc.getField("ss"), 2, m - 1), array(sNew)).as("ss"),
          concat(acc.getField("out"), array(lNew + sNew)).as("out"))
      })
    series.select(col("rows"), posexplode(fin.getField("out")).as(Seq("pos", "hw")))
      .select(
        element_at(col("rows"), col("pos") + m + 1).getField("day").as("day"),
        element_at(col("rows"), col("pos") + m + 1).getField("n").as("n"),
        round(col("hw"), 6).as("hw"))
      .orderBy(col("day"))
  }

  val movingHoltWintersSql: String =
    """WITH RECURSIVE b AS (
      |  SELECT row_number() OVER (ORDER BY day) AS rn, day, n
      |  FROM (SELECT date_trunc('day', ts) AS day, count(*) AS n
      |        FROM events GROUP BY 1)),
      |init AS (
      |  SELECT CAST(sum(n) AS BIGINT) AS s7,
      |    list(CAST(n AS DOUBLE) ORDER BY rn) AS y7
      |  FROM b WHERE rn <= 7),
      |rec AS (
      |  SELECT 7 AS rn,
      |    CAST(s7 AS DOUBLE) / 7.0 AS l,
      |    CAST(0.0 AS DOUBLE) AS tr,
      |    list_transform(y7, y -> y - CAST(s7 AS DOUBLE) / 7.0) AS ss,
      |    CAST(NULL AS DOUBLE) AS hw
      |  FROM init
      |  UNION ALL
      |  SELECT b.rn,
      |    0.5 * (CAST(b.n AS DOUBLE) - rec.ss[1]) + 0.5 * (rec.l + rec.tr) AS l,
      |    0.25 * ((0.5 * (CAST(b.n AS DOUBLE) - rec.ss[1]) + 0.5 * (rec.l + rec.tr)) - rec.l)
      |      + 0.75 * rec.tr AS tr,
      |    rec.ss[2:] ||
      |      [0.25 * (CAST(b.n AS DOUBLE) -
      |         (0.5 * (CAST(b.n AS DOUBLE) - rec.ss[1]) + 0.5 * (rec.l + rec.tr)))
      |       + 0.75 * rec.ss[1]] AS ss,
      |    (0.5 * (CAST(b.n AS DOUBLE) - rec.ss[1]) + 0.5 * (rec.l + rec.tr)) +
      |      (0.25 * (CAST(b.n AS DOUBLE) -
      |         (0.5 * (CAST(b.n AS DOUBLE) - rec.ss[1]) + 0.5 * (rec.l + rec.tr)))
      |       + 0.75 * rec.ss[1]) AS hw
      |  FROM rec JOIN b ON b.rn = rec.rn + 1)
      |SELECT b.day, b.n, round(rec.hw, 6) AS hw
      |FROM rec JOIN b ON b.rn = rec.rn
      |WHERE rec.rn > 7
      |ORDER BY b.day""".stripMargin

  val movingHoltSql: String =
    """WITH RECURSIVE b AS (
      |  SELECT row_number() OVER (ORDER BY day) AS rn, day, n
      |  FROM (SELECT date_trunc('day', ts) AS day, count(*) AS n
      |        FROM events GROUP BY 1)),
      |rec AS (
      |  SELECT rn, day, n, CAST(n AS DOUBLE) AS l, CAST(0.0 AS DOUBLE) AS tr
      |  FROM b WHERE rn = 1
      |  UNION ALL
      |  SELECT b.rn, b.day, b.n,
      |    0.5 * CAST(b.n AS DOUBLE) + 0.5 * (rec.l + rec.tr) AS l,
      |    0.25 * ((0.5 * CAST(b.n AS DOUBLE) + 0.5 * (rec.l + rec.tr)) - rec.l)
      |      + 0.75 * rec.tr AS tr
      |  FROM rec JOIN b ON b.rn = rec.rn + 1)
      |SELECT day, n, round(l + tr, 6) AS holt
      |FROM rec
      |ORDER BY day""".stripMargin

  /** C45h — moving_fn EWMA model (OpenSearch `MovingFunctions.ewma`):
    * exponentially-weighted trailing average over the parent buckets,
    * truncated at the series start like OpenSearch's shrinking window.
    * The 7 weight literals are Scala-computed doubles embedded
    * IDENTICALLY in both engines' expressions, and the weighted sum is
    * a fixed-order 7-term chain over integer counts — every IEEE op
    * matches bit-for-bit cross-engine, no rounding dance needed.
    */
  def movingEwma(spark: SparkSession, dir: String, beta: Double = 0.7): DataFrame = {
    val w = Window.orderBy(col("day"))
    val terms = (0 to 6).map { k =>
      val lagN = lag(col("n"), k).over(w)
      (when(lagN.isNotNull, lagN.cast("double") * lit(math.pow(beta, k))).otherwise(0.0),
        when(lagN.isNotNull, lit(math.pow(beta, k))).otherwise(0.0))
    }
    dailyBuckets(spark, dir)
      .withColumn("ewma_7d",
        terms.map(_._1).reduce(_ + _) / terms.map(_._2).reduce(_ + _))
      .select(col("day"), col("n"), col("ewma_7d"))
      .orderBy(col("day"))
  }

  val movingEwmaSql: String = {
    val num = (0 to 6).map { k =>
      val lit = String.format(java.util.Locale.ROOT, "%.17g", Double.box(math.pow(0.7, k))).trim
      s"(CASE WHEN lag(n, $k) OVER w IS NOT NULL THEN CAST(lag(n, $k) OVER w AS DOUBLE) * $lit ELSE 0.0 END)"
    }.mkString(" + ")
    val den = (0 to 6).map { k =>
      val lit = String.format(java.util.Locale.ROOT, "%.17g", Double.box(math.pow(0.7, k))).trim
      s"(CASE WHEN lag(n, $k) OVER w IS NOT NULL THEN $lit ELSE 0.0 END)"
    }.mkString(" + ")
    s"""WITH b AS ($dailyBucketsSql)
       |SELECT day, n, ($num) / ($den) AS ewma_7d
       |FROM b
       |WINDOW w AS (ORDER BY day)
       |ORDER BY day""".stripMargin
  }

  /** C45m — moving_fn linearWeightedAvg model (OpenSearch
    * `MovingFunctions.linearWeightedAvg`): trailing average whose
    * weights decay LINEARLY with age — newest bucket weighs `window`,
    * oldest weighs 1 — the dashboard smoother between the flat mean
    * (C45b) and the exponential family (C45h/n/o). Truncates at the
    * series start exactly like OpenSearch's `MovingFunctions
    * .linearWeightedAvg`: weights attach to the PRESENT values, oldest
    * present = 1 up to newest present = w' (the count of non-null
    * lags) — so with only two days seen the average is (a + 2b)/3,
    * not a renormalized slice of the full-window weights. With the
    * day series gap-free, w' = min(row_number, window), so each lag k
    * carries weight w'−k.
    *
    * Determinism is stronger than EWMA's here: both numerator
    * (Σ wᵢ·yᵢ) and denominator (Σ wᵢ) are sums of INTEGER products
    * over the BIGINT day counts, so the only floating-point op is the
    * final division — bit-identical cross-engine with no weight
    * literals to synchronize. The window runs over the bounded day
    * series; data-sized work stays in the dailyBuckets aggregate.
    */
  def movingLwma(spark: SparkSession, dir: String, windowN: Int = 7): DataFrame = {
    val w = Window.orderBy(col("day"))
    val present = least(row_number().over(w), lit(windowN)).cast("long")
    val terms = (0 until windowN).map { k =>
      val lagN = lag(col("n"), k).over(w)
      (when(lagN.isNotNull, lagN * (present - lit(k.toLong))).otherwise(0L),
        when(lagN.isNotNull, present - lit(k.toLong)).otherwise(0L))
    }
    dailyBuckets(spark, dir)
      .withColumn("lwma_7d",
        terms.map(_._1).reduce(_ + _).cast("double") /
          terms.map(_._2).reduce(_ + _).cast("double"))
      .select(col("day"), col("n"), col("lwma_7d"))
      .orderBy(col("day"))
  }

  val movingLwmaSql: String = {
    val p = "LEAST(row_number() OVER w, 7)"
    val num = (0 until 7).map { k =>
      s"(CASE WHEN lag(n, $k) OVER w IS NOT NULL THEN lag(n, $k) OVER w * ($p - $k) ELSE 0 END)"
    }.mkString(" + ")
    val den = (0 until 7).map { k =>
      s"(CASE WHEN lag(n, $k) OVER w IS NOT NULL THEN ($p - $k) ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH b AS ($dailyBucketsSql)
       |SELECT day, n, CAST($num AS DOUBLE) / CAST($den AS DOUBLE) AS lwma_7d
       |FROM b
       |WINDOW w AS (ORDER BY day)
       |ORDER BY day""".stripMargin
  }

  /** C45s — autocorrelation of the bucket series (ACF at lags 1..7:
    * the seasonality DIAGNOSTIC behind the forecasting family — a
    * spike at lag 7 is what justifies holt_winters' weekly period, and
    * the anomaly-detection plugin's seasonal decomposition asks the
    * same question). Exactness device: with N days and S = Σy, the
    * centered terms scale to a_t = N·y_t − S — exact BIGINTs — and
    * r_k = Σ a_t·a_{t−k} / Σ a_t² (the N² factors cancel), so each
    * lag is one exact-integer division. Lag products come from
    * windows over the bounded day series; raw data contributes ONE
    * map-side-combined aggregate.
    */
  def autocorrelation(spark: SparkSession, dir: String, maxLag: Int = 7): DataFrame = {
    val w = Window.orderBy(col("day"))
    val b = dailyBuckets(spark, dir).select(col("day"), col("n"))
    val tot = b.agg(count(lit(1)).as("nd"), sum(col("n")).as("s"))
    val centered = b.crossJoin(broadcast(tot))
      .withColumn("a", col("nd") * col("n") - col("s"))
    val lagged = (1 to maxLag).foldLeft(centered) { (df, k) =>
      df.withColumn(s"p_$k", col("a") * lag(col("a"), k).over(w))
    }
    val sums = lagged.agg(
      sum(col("a") * col("a")).as("den"),
      (1 to maxLag).map(k => sum(col(s"p_$k")).as(s"num_$k")): _*)
    val stackArgs = (1 to maxLag).flatMap { k =>
      Seq(lit(k.toLong), round(col(s"num_$k").cast("double") / col("den").cast("double"), 6))
    }
    sums.select(stack((lit(maxLag) +: stackArgs): _*).as(Seq("lag", "acf")))
      .orderBy(col("lag"))
  }

  val autocorrelationSql: String = {
    val lags = (1 to 7).map(k => s"lag(a, $k) OVER w AS a_$k").mkString(",\n    ")
    val nums = (1 to 7).map(k =>
      s"CAST(sum(a * a_$k) AS BIGINT) AS num_$k").mkString(",\n    ")
    val arms = (1 to 7).map(k =>
      s"SELECT CAST($k AS BIGINT) AS lag, round(CAST(num_$k AS DOUBLE) / CAST(den AS DOUBLE), 6) AS acf FROM s")
      .mkString("\nUNION ALL\n")
    s"""WITH b AS ($dailyBucketsSql),
       |t AS (SELECT count(*) AS nd, CAST(sum(n) AS BIGINT) AS s FROM b),
       |c AS (SELECT day, nd * n - s AS a FROM b CROSS JOIN t),
       |l AS (
       |  SELECT a,
       |    $lags
       |  FROM c WINDOW w AS (ORDER BY day)),
       |s AS (
       |  SELECT CAST(sum(a * a) AS BIGINT) AS den,
       |    $nums
       |  FROM l)
       |$arms
       |ORDER BY lag""".stripMargin
  }

  /** C45r — bucket_count_ks_test (the OpenSearch ML pipeline agg: a
    * two-sample Kolmogorov–Smirnov test over a sibling histogram's
    * bucket counts — "is the error-count distribution over time shaped
    * like overall traffic, or did errors cluster?"). The statistic is
    * D = max over buckets of |CDF_err(day) − CDF_all(day)|.
    *
    * Exactness device: both CDFs are rational numbers cum/tot over
    * exact BIGINT cumsums, so D's argmax is decided in INTEGER
    * cross-multiplied form — |cum_a·tot_b − cum_b·tot_a| — and the
    * single division happens once, on the winning bucket's exact
    * integers (tie → earliest day). At 100 TB the series is still
    * day-bucket-sized: one map-side-combined aggregate below, window
    * cumsums + one TakeOrdered(1) over the bounded series above.
    */
  def ksTest(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val b = dailyBuckets(spark, dir)
      .select(col("day"), col("n_err"), col("n"))
      .withColumn("cum_a", sum(col("n_err")).over(w))
      .withColumn("cum_b", sum(col("n")).over(w))
    val tot = b.agg(max(col("cum_a")).as("tot_a"), max(col("cum_b")).as("tot_b"))
    b.crossJoin(broadcast(tot))
      .withColumn("gap_scaled",
        abs(col("cum_a") * col("tot_b") - col("cum_b") * col("tot_a")))
      .orderBy(col("gap_scaled").desc, col("day"))
      .limit(1)
      .select(
        col("day").as("ks_day"),
        round(col("gap_scaled").cast("double") /
          (col("tot_a") * col("tot_b")).cast("double"), 6).as("ks_d"),
        col("tot_a"), col("tot_b"))
  }

  val ksTestSql: String =
    s"""WITH b AS ($dailyBucketsSql),
       |c AS (
       |  SELECT day,
       |    CAST(sum(n_err) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_a,
       |    CAST(sum(n) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_b
       |  FROM b),
       |t AS (SELECT max(cum_a) AS tot_a, max(cum_b) AS tot_b FROM c),
       |g AS (
       |  SELECT day, abs(cum_a * tot_b - cum_b * tot_a) AS gap_scaled, tot_a, tot_b
       |  FROM c CROSS JOIN t)
       |SELECT day AS ks_day,
       |  round(CAST(gap_scaled AS DOUBLE) / CAST(tot_a * tot_b AS DOUBLE), 6) AS ks_d,
       |  tot_a, tot_b
       |FROM g
       |ORDER BY gap_scaled DESC, day
       |LIMIT 1""".stripMargin
  // ---------------------------------------------------------------- C80

  /** C80 — series forecast (the forecasting API the AD plugin grew:
    * project the daily series h steps AHEAD, not smooth it — C45n
    * smooths). Holt linear-trend state (alpha=0.5, beta=0.25, the C45n
    * model and recursion exactly) folds once over the FULL ordered
    * series, then the h-step-ahead projection is the closed form
    * l + h*t for h = 1..horizon.
    *
    * Shape: the daily series collapses to ONE row (sort_array over a
    * bucket-count list — bounded by the day span, not event count); the
    * fold is a single higher-order `aggregate` over that array (no
    * per-row window recursion — the forecast needs only the FINAL
    * state); the horizon explodes from a `sequence` literal. Beyond
    * the daily aggregate every step is O(days + horizon) on one row.
    * Determinism: the fold is the same fixed-order IEEE chain as the
    * oracle's recursive CTE; round(6) on output.
    */
  def forecast(spark: SparkSession, dir: String, horizon: Int = 7,
               alpha: Double = 0.5, beta: Double = 0.25): DataFrame = {
    val ys = expr("transform(array_sort(arr), x -> CAST(x.n AS DOUBLE))")
    val st = aggregate(
      ys,
      struct(lit(0.0).as("l"), lit(0.0).as("tr"), lit(0).as("i")),
      (acc, y) => {
        val lPrev = acc.getField("l"); val tPrev = acc.getField("tr")
        val lNew = lit(alpha) * y + lit(1.0 - alpha) * (lPrev + tPrev)
        when(acc.getField("i") === 0,
          struct(y.as("l"), lit(0.0).as("tr"), lit(1).as("i")))
          .otherwise(struct(
            lNew.as("l"),
            (lit(beta) * (lNew - lPrev) + lit(1.0 - beta) * tPrev).as("tr"),
            (acc.getField("i") + 1).as("i")))
      })
    dailyBuckets(spark, dir)
      .agg(collect_list(struct(col("day"), col("n"))).as("arr"),
        max(col("day")).as("last_day"))
      .withColumn("st", st)
      .select(col("last_day"), col("st.l").as("l"), col("st.tr").as("tr"),
        explode(sequence(lit(1L), lit(horizon.toLong))).as("h"))
      .select(col("h"),
        expr("timestampadd(DAY, CAST(h AS INT), last_day)").as("day"),
        round(col("l") + col("h") * col("tr"), 6).as("forecast"))
      .orderBy(col("h"))
  }

  val forecastSql: String =
    """WITH RECURSIVE b AS (
      |  SELECT row_number() OVER (ORDER BY day) AS rn, day, n
      |  FROM (SELECT date_trunc('day', ts) AS day, count(*) AS n
      |        FROM events GROUP BY 1)),
      |rec AS (
      |  SELECT rn, day, CAST(n AS DOUBLE) AS l, CAST(0.0 AS DOUBLE) AS tr
      |  FROM b WHERE rn = 1
      |  UNION ALL
      |  SELECT b.rn, b.day,
      |    0.5 * CAST(b.n AS DOUBLE) + 0.5 * (rec.l + rec.tr) AS l,
      |    0.25 * ((0.5 * CAST(b.n AS DOUBLE) + 0.5 * (rec.l + rec.tr)) - rec.l)
      |      + 0.75 * rec.tr AS tr
      |  FROM rec JOIN b ON b.rn = rec.rn + 1),
      |last AS (
      |  SELECT day, l, tr FROM rec WHERE rn = (SELECT max(rn) FROM rec)),
      |hs AS (SELECT unnest(range(1, 8)) AS h)
      |SELECT CAST(hs.h AS BIGINT) AS h,
      |  last.day + hs.h * INTERVAL 1 DAY AS day,
      |  round(l + hs.h * tr, 6) AS forecast
      |FROM last CROSS JOIN hs
      |ORDER BY h""".stripMargin

  // ---- C79: robust non-parametric trend (Mann–Kendall + Theil–Sen) ----

  /** Distribution-free trend audit over the monthly revenue series —
    * the robust pair the parametric C45 battery lacks: Mann–Kendall's
    * S statistic with tie-corrected variance (Mann 1945; Kendall 1975)
    * answers "IS there a monotone trend" without assuming normality or
    * linearity, and the Theil–Sen estimator (Theil 1950; Sen 1968) —
    * the median of all pairwise slopes — says how steep, immune to the
    * outlier months that wreck an OLS slope. The standard pairing in
    * environmental/ops trend monitoring (e.g. Hirsch et al. 1982).
    *
    * Determinism: S is an exact sign-sum over exact-cents pairs; the
    * variance is kept as the exact integer 18·Var (ties folded by the
    * standard t(t−1)(2t+5) correction); z floors to micro from
    * identical doubles (sqrt of the same double is IEEE-exact both
    * engines); the Theil–Sen median uses the exact-interpolation
    * percentile both engines share.
    *
    * Scale shape: after ONE month-keyed aggregate the series is
    * calendar-bounded (~80 rows regardless of corpus size), so the
    * pairwise frame is ≤ 80²/2 rows broadcast — the trend test is
    * scale-INDEPENDENT past the first aggregate.
    */
  def trendRobust(spark: SparkSession, dir: String): DataFrame = {
    val monthly = Tables.orders(spark, dir)
      .groupBy(((year(col("o_orderdate")) * 12) +
        month(col("o_orderdate"))).cast("long").as("x"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("y"))
    val p1 = monthly.select(col("x").as("x1"), col("y").as("y1"))
    val p2 = monthly.select(col("x").as("x2"), col("y").as("y2"))
    val pairs = p1.join(broadcast(p2), col("x1") < col("x2"))
      .select(col("x1"), col("x2"), col("y1"), col("y2"),
        signum((col("y2") - col("y1")).cast("double")).cast("long").as("sg"),
        ((col("y2") - col("y1")).cast("double") /
          (col("x2") - col("x1")).cast("double")).as("slope"))
    val sAgg = pairs.agg(sum(col("sg")).as("s_stat"),
      expr("percentile(slope, 0.5)").as("ts_slope"))
    val nRow = monthly.agg(count(lit(1)).as("n_months"))
    val ties = monthly.groupBy(col("y")).agg(count(lit(1)).as("t"))
      .agg(coalesce(sum(col("t") * (col("t") - 1) * (lit(2L) * col("t") + 5)),
        lit(0L)).as("tie18"))
    sAgg.crossJoin(broadcast(nRow)).crossJoin(broadcast(ties))
      .select(col("n_months"), col("s_stat"),
        (col("n_months") * (col("n_months") - 1) *
          (lit(2L) * col("n_months") + 5) - col("tie18")).as("var18"),
        col("ts_slope"))
      .select(col("n_months"), col("s_stat"), col("var18"),
        floor(
          when(col("s_stat") > 0, (col("s_stat") - 1).cast("double"))
            .when(col("s_stat") < 0, (col("s_stat") + 1).cast("double"))
            .otherwise(lit(0.0)) /
          sqrt(col("var18").cast("double") / lit(18.0)) * 1e6)
          .cast("long").as("z_micro"),
        round(col("ts_slope"), 6).as("theil_sen_cents"))
      .withColumn("trend",
        when(col("z_micro") > 1960000L, "increasing")
          .when(col("z_micro") < -1960000L, "decreasing")
          .otherwise("none"))
  }

  val trendRobustSql: String =
    """WITH monthly AS (
      |  SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
      |           AS x,
      |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |           AS y
      |  FROM orders GROUP BY 1),
      |pairs AS (
      |  SELECT CAST(sign(CAST(b.y - a.y AS DOUBLE)) AS BIGINT) AS sg,
      |    CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS slope
      |  FROM monthly a JOIN monthly b ON a.x < b.x),
      |s AS (SELECT CAST(sum(sg) AS BIGINT) AS s_stat,
      |             quantile_cont(slope, 0.5) AS ts_slope FROM pairs),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS n_months FROM monthly),
      |ties AS (
      |  SELECT CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
      |           AS tie18
      |  FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM monthly GROUP BY y)),
      |v AS (
      |  SELECT n_months, s_stat,
      |    n_months * (n_months - 1) * (2 * n_months + 5) - tie18 AS var18,
      |    ts_slope
      |  FROM s CROSS JOIN n CROSS JOIN ties)
      |SELECT n_months, s_stat, CAST(var18 AS BIGINT) AS var18,
      |  CAST(floor(
      |    (CASE WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE)
      |          WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE)
      |          ELSE 0.0 END)
      |    / sqrt(CAST(var18 AS DOUBLE) / 18.0) * 1e6) AS BIGINT) AS z_micro,
      |  round(ts_slope, 6) AS theil_sen_cents,
      |  CASE WHEN CAST(floor(
      |    (CASE WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE)
      |          WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE)
      |          ELSE 0.0 END)
      |    / sqrt(CAST(var18 AS DOUBLE) / 18.0) * 1e6) AS BIGINT) > 1960000
      |       THEN 'increasing'
      |       WHEN CAST(floor(
      |    (CASE WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE)
      |          WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE)
      |          ELSE 0.0 END)
      |    / sqrt(CAST(var18 AS DOUBLE) / 18.0) * 1e6) AS BIGINT) < -1960000
      |       THEN 'decreasing' ELSE 'none' END AS trend
      |FROM v""".stripMargin
}

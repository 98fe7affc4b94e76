package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Percolate / stored-query alerting (SURVEY §2 C49).
  *
  * OpenSearch's percolator inverts search: ALERT RULES are stored, and
  * each incoming document is matched against every rule — the unified-
  * log pipeline's monitoring face (the reference's dashboards exist to
  * watch error conditions; a percolator is how those conditions fire
  * without polling).
  *
  * Spark-first shape: the rule table is tiny and BROADCAST; matching is
  * an equi-join on the rule's term predicate (event_type) with the
  * range predicates as join residuals — a BroadcastHashJoin the facts
  * stream through map-side, zero fact shuffle. Rules with no matches
  * still report (n=0) via the left join on the 8-row aggregate.
  * The streaming arm (stream-static join, same rule table) is
  * `LogPipeline.percolateStream` — StreamingSpec drives it.
  */
object Alerting {

  val etypes: Seq[String] = Seq("view", "click", "signup", "purchase", "error")

  /** Deterministic stored-rule table: rule i watches event type i%5
    * within the value band [10i, 10i+40). */
  def rules(spark: SparkSession): DataFrame =
    spark.range(8).select(
      col("id").as("rule_id"),
      element_at(array(etypes.map(lit): _*), (col("id") % 5).cast("int") + 1).as("etype"),
      (col("id") * 10).cast("double").as("min_val"),
      (col("id") * 10 + 40).cast("double").as("max_val"))

  /** C49 — match every event against every stored rule; per-rule match
    * and distinct-user counts, zero-match rules included.
    */
  def percolate(spark: SparkSession, dir: String,
                ruleTable: Option[DataFrame] = None): DataFrame = {
    val r = ruleTable.getOrElse(rules(spark))
    val matched = Tables.events(spark, dir)
      .join(broadcast(r),
        col("event_type") === col("etype") &&
        col("value") >= col("min_val") && col("value") < col("max_val"))
      .groupBy(col("rule_id"))
      .agg(count(lit(1)).as("n_matches"), countDistinct(col("user_id")).as("n_users"))
    r.join(matched, Seq("rule_id"), "left")
      .select(col("rule_id"), col("etype"),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"),
        coalesce(col("n_users"), lit(0L)).as("n_users"))
      .orderBy(col("rule_id"))
  }

  /** Stored rules AS USERS WRITE THEM — Discover search-bar strings
    * (C56's grammar), not pre-decomposed (term, band) tuples.
    */
  val dqlRules: Seq[(Long, String)] = Seq(
    0L -> "event_type:error AND value:>=200",
    1L -> "event_type:purchase AND value:[250 TO *]",
    2L -> "(event_type:signup OR event_type:click) AND value:<0.1",
    3L -> "event_type:error AND user_id:<5")

  /** C49b — percolate with query_string rules: each stored DQL rule
    * compiles (once, on the driver) to a native predicate, and the
    * event stream is evaluated against ALL rules in one pass — a
    * single scan projecting one boolean per rule, aggregated map-side.
    * No joins at all: for dashboard-scale rule counts the rule battery
    * is a codegen'd when() bank riding the scan. (At 10k+ stored rules
    * the C49 term-indexed join form is the scale path — the percolator
    * literature's index-the-queries trick; both forms share the rule
    * semantics via the same compiler.)
    */
  def percolateQueryString(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val flags = dqlRules.map { case (id, q) =>
      when(graft.functions.QueryString.compile(ev, q), 1L).otherwise(0L).as(s"r$id")
    }
    val aggCols =
      dqlRules.map { case (id, _) => sum(col(s"r$id")).as(s"n$id") } ++
        dqlRules.map { case (id, _) =>
          countDistinct(when(col(s"r$id") === 1, col("user_id"))).as(s"u$id") }
    val agg = ev.select(col("user_id") +: flags: _*)
      .agg(aggCols.head, aggCols.tail: _*)
    val stacked = dqlRules.map { case (id, q) =>
      agg.select(lit(id).as("rule_id"), lit(q).as("query"),
        col(s"n$id").as("n_matches"), col(s"u$id").as("n_users"))
    }.reduce(_ unionByName _)
    stacked.orderBy(col("rule_id"))
  }

  // ---- C49e: INDEXED percolator (the 10k+-rule scale path) -----------

  /** Structured rule row for the indexed form: `terms` is the rule's
    * any-of required-term set (OR over event types — the part a term
    * index can serve); `vmin ≤ value < vmax` and `user_id < umax` are
    * the residual predicates (NULL = unbounded). Every C49b DQL rule
    * decomposes into this shape; the spec proves parity on exactly
    * those four.
    */
  def indexedRules(spark: SparkSession, n: Int = 512): DataFrame = {
    def etype(c: org.apache.spark.sql.Column) =
      element_at(array(etypes.map(lit): _*), c.cast("int") + 1)
    spark.range(n).select(
      col("id").as("rule_id"),
      when(col("id") % 3 === 0,
        array(etype(col("id") % 5), etype((col("id") + 1) % 5)))
        .otherwise(array(etype(col("id") % 5))).as("terms"),
      when(col("id") % 11 === 0, lit(null).cast("double"))
        .otherwise(((col("id") % 50) * 10).cast("double")).as("vmin"),
      ((col("id") % 50) * 10 + 60).cast("double").as("vmax"),
      when(col("id") % 7 === 0, lit(800L)).otherwise(lit(null).cast("long")).as("umax"))
  }

  /** C49e — indexed percolator: the percolator literature's
    * index-the-QUERIES trick (what OpenSearch's percolator field type
    * does internally), and the form SURVEY §2 C49b promises once the
    * rule battery outgrows a when() bank — a 10k-branch codegen bank
    * trips the JVM's 64KB method limit and compiles per-batch, while
    * this form treats rules as DATA:
    *
    *   1. the rule battery inverts ONCE into a term→rule posting table
    *      (one row per required term, residual bounds carried on the
    *      posting row so candidates never join back to the rule table);
    *   2. each event probes its single indexed term via ONE equi-join —
    *      candidate volume is Σ events(term)·rules(term), never
    *      events × rules, and an event whose type no rule watches
    *      drops at the join;
    *   3. residual predicates verify candidates in the join's filter;
    *   4. one per-rule aggregate, zero-match rules restored by the
    *      left join against the rule list.
    *
    * The posting side is broadcast (10k rules ≈ a few MB; at millions
    * of rules drop the hint and let the same plan shuffle on term).
    * The fact table is scanned ONCE regardless of rule count — the
    * plan contract AlertingSpec asserts.
    */
  def percolateIndexed(spark: SparkSession, dir: String,
                       ruleTable: Option[DataFrame] = None): DataFrame = {
    val r = ruleTable.getOrElse(indexedRules(spark))
    val post = r.select(col("rule_id"), explode(col("terms")).as("term"),
      col("vmin"), col("vmax"), col("umax"))
    val matched = Tables.events(spark, dir)
      .join(broadcast(post), col("event_type") === col("term"))
      .filter(
        (col("vmin").isNull || col("value") >= col("vmin")) &&
        (col("vmax").isNull || col("value") < col("vmax")) &&
        (col("umax").isNull || col("user_id") < col("umax")))
      .groupBy(col("rule_id"))
      .agg(count(lit(1)).as("n_matches"), countDistinct(col("user_id")).as("n_users"))
    r.select(col("rule_id")).join(matched, Seq("rule_id"), "left")
      .select(col("rule_id"),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"),
        coalesce(col("n_users"), lit(0L)).as("n_users"))
      .orderBy(col("rule_id"))
  }

  val percolateIndexedSql: String = {
    val et = "['view','click','signup','purchase','error']"
    s"""WITH rules AS (
       |  SELECT i AS rule_id,
       |         CASE WHEN i % 3 = 0
       |              THEN [$et[CAST(i % 5 AS INT) + 1], $et[CAST((i + 1) % 5 AS INT) + 1]]
       |              ELSE [$et[CAST(i % 5 AS INT) + 1]]
       |         END AS terms,
       |         CASE WHEN i % 11 = 0 THEN NULL
       |              ELSE CAST((i % 50) * 10 AS DOUBLE) END AS vmin,
       |         CAST((i % 50) * 10 + 60 AS DOUBLE) AS vmax,
       |         CASE WHEN i % 7 = 0 THEN 800 ELSE NULL END AS umax
       |  FROM range(512) t(i)),
       |post AS (
       |  SELECT rule_id, unnest(terms) AS term, vmin, vmax, umax FROM rules),
       |matched AS (
       |  SELECT p.rule_id, count(*) AS n_matches,
       |         count(DISTINCT e.user_id) AS n_users
       |  FROM events e JOIN post p ON e.event_type = p.term
       |  WHERE (p.vmin IS NULL OR e.value >= p.vmin)
       |    AND (p.vmax IS NULL OR e.value < p.vmax)
       |    AND (p.umax IS NULL OR e.user_id < p.umax)
       |  GROUP BY 1)
       |SELECT r.rule_id,
       |  coalesce(m.n_matches, 0) AS n_matches,
       |  coalesce(m.n_users, 0) AS n_users
       |FROM rules r LEFT JOIN matched m ON r.rule_id = m.rule_id
       |ORDER BY r.rule_id""".stripMargin
  }

  val percolateQueryStringSql: String =
    """WITH f AS (
      |  SELECT user_id,
      |    CASE WHEN event_type = 'error' AND value >= 200 THEN 1 ELSE 0 END AS r0,
      |    CASE WHEN event_type = 'purchase' AND value >= 250 THEN 1 ELSE 0 END AS r1,
      |    CASE WHEN (event_type = 'signup' OR event_type = 'click') AND value < 0.1 THEN 1 ELSE 0 END AS r2,
      |    CASE WHEN event_type = 'error' AND user_id < 5 THEN 1 ELSE 0 END AS r3
      |  FROM events)
      |SELECT CAST(t.rule_id AS BIGINT) AS rule_id, t.query,
      |  CAST(t.n_matches AS BIGINT) AS n_matches,
      |  CAST(t.n_users AS BIGINT) AS n_users
      |FROM (
      |  SELECT 0 AS rule_id, 'event_type:error AND value:>=200' AS query,
      |    sum(r0) AS n_matches, count(DISTINCT CASE WHEN r0 = 1 THEN user_id END) AS n_users FROM f
      |  UNION ALL
      |  SELECT 1, 'event_type:purchase AND value:[250 TO *]',
      |    sum(r1), count(DISTINCT CASE WHEN r1 = 1 THEN user_id END) FROM f
      |  UNION ALL
      |  SELECT 2, '(event_type:signup OR event_type:click) AND value:<0.1',
      |    sum(r2), count(DISTINCT CASE WHEN r2 = 1 THEN user_id END) FROM f
      |  UNION ALL
      |  SELECT 3, 'event_type:error AND user_id:<5',
      |    sum(r3), count(DISTINCT CASE WHEN r3 = 1 THEN user_id END) FROM f
      |) t
      |ORDER BY rule_id""".stripMargin

  val percolateSql: String =
    """WITH rules AS (
      |  SELECT i AS rule_id,
      |         ['view','click','signup','purchase','error'][CAST(i % 5 AS INT) + 1] AS etype,
      |         CAST(i * 10 AS DOUBLE) AS min_val,
      |         CAST(i * 10 + 40 AS DOUBLE) AS max_val
      |  FROM range(8) t(i))
      |SELECT r.rule_id, r.etype,
      |  count(e.event_id) AS n_matches,
      |  count(DISTINCT e.user_id) AS n_users
      |FROM rules r LEFT JOIN events e
      |  ON e.event_type = r.etype AND e.value >= r.min_val AND e.value < r.max_val
      |GROUP BY 1, 2
      |ORDER BY rule_id""".stripMargin
}

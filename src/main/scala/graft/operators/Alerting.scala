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

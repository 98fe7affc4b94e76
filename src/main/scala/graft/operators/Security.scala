package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.QueryString
import graft.sources.Tables

/** C74 — document- and field-level security (the OpenSearch security
  * plugin's DLS/FLS: a role carries a stored query that silently ANDs
  * into every search the role runs, a field allow/deny list, and
  * field MASKING — the masked column returns a one-way hash so joins
  * and grouping still work without exposing the value).
  *
  * Spark-first: a role compiles ONCE to (pushable Column predicate,
  * projection rewrite). The DLS filter goes through the SAME C56 DQL
  * compiler user queries use, so it pushes into the scan like any
  * predicate — security costs a filter, not a post-scan pass — and
  * masking is a codegen'd md5 projection (the plugin's default is the
  * same shape: a salted hash per value). Because enforcement happens
  * at PLAN REWRITE time, every downstream operator — aggregations,
  * joins, exports — inherits it; there is no unfiltered frame to leak.
  */
object Security {

  /** A role: stored DLS query (DQL), denied fields (dropped), masked
    * fields (one-way hashed in place).
    */
  final case class Role(dls: String, denied: Seq[String], masked: Seq[String])

  val roles: Map[String, Role] = Map(
    // commerce analysts: purchase/view events only, no raw props,
    // user identity masked but still groupable
    "analyst" -> Role("event_type:purchase OR event_type:view",
      denied = Seq("props"), masked = Seq("user_id")),
    // SRE on-call: error stream only, full fields
    "oncall" -> Role("event_type:error", denied = Nil, masked = Nil))

  private def maskCol(c: Column): Column = substring(md5(c.cast("string")), 1, 12)

  /** The secured view of the events table for `role` — what every
    * query the role runs starts from.
    */
  def readAs(spark: SparkSession, dir: String, role: String): DataFrame = {
    val r = roles.getOrElse(role,
      throw new IllegalArgumentException(s"unknown role '$role'"))
    val ev = Tables.events(spark, dir)
    val filtered = ev.filter(QueryString.compile(ev, r.dls))
    val dropped = filtered.drop(r.denied: _*)
    r.masked.foldLeft(dropped)((df, f) => df.withColumn(f, maskCol(col(f))))
  }

  /** ★ query: the analyst view — DLS filter applied, props denied,
    * user_id masked yet aggregation-stable (distinct masked users per
    * type equals distinct real users among visible docs).
    */
  def dlsFls(spark: SparkSession, dir: String): DataFrame =
    readAs(spark, dir, "analyst")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_masked_users"),
        min(col("user_id")).as("sample_masked"))
      .orderBy(col("event_type"))

  val dlsFlsSql: String =
    """SELECT event_type, count(*) AS n,
      |  count(DISTINCT substr(md5(CAST(user_id AS VARCHAR)), 1, 12)) AS n_masked_users,
      |  min(substr(md5(CAST(user_id AS VARCHAR)), 1, 12)) AS sample_masked
      |FROM events
      |WHERE event_type = 'purchase' OR event_type = 'view'
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin
}

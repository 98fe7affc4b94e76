package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** F11 / C72 — the `_profile` API re-expressed (OpenSearch's search
  * profiler returns per-component timing/row breakdowns for a query;
  * Spark's equivalent truth lives in the EXECUTED physical plan's SQL
  * metrics). `profile` runs the exact plan once and walks the final
  * (post-AQE) plan tree, emitting one row per (node, metric) — rows
  * output, scan time, files read, shuffle bytes, spill — the numbers a
  * user needs to see WHY a query is slow, from the same source the
  * Spark UI reads.
  *
  * This is an engine-introspection surface, not a data query: there is
  * nothing for a SQL oracle to check (the values are runtime metrics),
  * so it is spec-covered — ProfilerSpec asserts the structural
  * contract: scan nodes report their row counts, a pushed filter scan
  * reads fewer rows than the table holds, and every metric row carries
  * the node's codegen stage so whole-stage spans are visible.
  */
object Profiler {

  case class MetricRow(node_id: Int, node: String, metric: String, value: Long)

  /** Execute `df`'s OWN plan (not a derived count plan) and dump the
    * executed tree's metrics. `toRdd.foreach` drives the exact
    * QueryExecution whose metrics we then read; with AQE the final
    * re-planned tree is what reports.
    */
  def profile(spark: SparkSession, df: DataFrame): DataFrame = {
    import spark.implicits._
    df.queryExecution.toRdd.foreach(_ => ())
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val rows = scala.collection.mutable.ArrayBuffer.empty[MetricRow]
    var id = 0
    def walk(p: SparkPlan): Unit = {
      val nid = id; id += 1
      p.metrics.foreach { case (name, m) =>
        if (m.value >= 0) rows += MetricRow(nid, p.nodeName, name, m.value)
      }
      p match {
        // AQE wraps each materialized stage as a LEAF QueryStageExec —
        // the real operators (and their metrics) hang off `.plan`
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
        case _ => p.children.foreach(walk)
      }
      // subqueries hang off expressions, not children
      p.subqueries.foreach(walk)
    }
    walk(plan)
    spark.createDataset(rows.toSeq).toDF()
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** C73 — graph analytics over the service-dependency graph (SURVEY §2):
  * weighted PageRank as the service-criticality ranking ("which service
  * does the fleet lean on?") — the read an operator does on the C71
  * service map when deciding what pages first. Brin & Page 1998, the
  * weighted variant: rank flows along call edges proportional to call
  * volume.
  *
  * Exact integer recurrence so the result is bit-identical cross-engine
  * AND at any partitioning: ranks live in micro-units (S = 1e9); edge
  * weights normalize to per-source micro-ratios once (wr = w·1e6 div
  * W_u ≤ 1e6, so r·wr ≤ 1e15 — overflow-safe at any corpus size);
  * each of the fixed `iters` rounds is
  *     r'(v) = (15·S) div (100·N)  +  (85 · Σ_u r(u)·wr(u,v) div 1e6) div 100
  * with floor division everywhere (documented mass leak from flooring
  * and dangling nodes — identical in both engines by construction).
  *
  * Spark shape: the rank table iterates through `iters` join+aggregate
  * rounds against the STATIC normalized edge list (localCheckpoint per
  * round keeps the plan constant-size — the BpeTrain loop discipline).
  * The exchange each round carries |nodes| + |edges| rows; node count
  * is service-fleet-sized, never event-sized. The DuckDB oracle unrolls
  * the same fixed iteration count as chained CTEs.
  */
object GraphMetrics {

  private val S = 1000000000L // rank scale: micro-units of 1e9
  private val WS = 1000000L   // weight-ratio scale

  /** (src, dst, calls) edges from the C71 span model — re-derived here
    * exactly as serviceMap does so the oracle can mirror it.
    */
  private def edges(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        when(col("user_id") % 3 === 0, "web")
          .when(col("user_id") % 3 === 1, "mobile")
          .otherwise("api-gw").as("src"),
        when(col("event_type") === "view", "catalog")
          .when(col("event_type") === "click", "frontend")
          .when(col("event_type") === "signup", "auth")
          .when(col("event_type") === "purchase", "payment")
          .otherwise(when(col("user_id") % 2 === 0, "payment").otherwise("catalog"))
          .as("dst"))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))

  def pageRank(spark: SparkSession, dir: String, iters: Int = 10): DataFrame = {
    // The service vocabulary is CLOSED by the C71 span model (3 source
    // × 4 target literals in `edges`' CASE mapping), so the aggregated
    // edge list is ≤ 12 rows at ANY corpus size — the data-sized work
    // is exactly ONE aggregated pass over events. The power iteration
    // is then driver arithmetic on those few longs (the bounded-collect
    // contract argminCell/doremi already use): identical floor-division
    // recurrence, identical long sums (addition order immaterial —
    // exact integers), where the r14-measured shape paid ten
    // join+aggregate+localCheckpoint Spark rounds (~60 driver jobs) on
    // a ≤12-row table.
    val normRows = edges(spark, dir)
      .groupBy(col("src"))
      .agg(sum(col("w")).as("wout"), collect_list(struct(col("dst"), col("w"))).as("outs"))
      .select(col("src"), explode(col("outs")).as("o"), col("wout"))
      .select(col("src"), col("o.dst").as("dst"),
        expr(s"CAST((o.w * $WS) div wout AS LONG)").as("wr"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val nodes = (normRows.map(_._1) ++ normRows.map(_._2)).distinct.sorted
    val n = nodes.length.toLong
    val base15 = (15L * S) / (100L * n)
    var rank: Map[String, Long] = nodes.map(_ -> S / n).toMap
    for (_ <- 1 to iters) {
      val inflow = scala.collection.mutable.Map.empty[String, Long]
      normRows.foreach { case (src, dst, wr) =>
        inflow.update(dst, inflow.getOrElse(dst, 0L) + (rank(src) * wr) / WS)
      }
      rank = nodes.map(nd =>
        nd -> (base15 + (85L * inflow.getOrElse(nd, 0L)) / 100L)).toMap
    }
    val s = spark
    import s.implicits._
    nodes.map(nd => (nd, rank(nd))).toSeq.toDF("service", "rank_micro")
      .select(col("service"), col("rank_micro"),
        round(col("rank_micro").cast("double") / S, 6).as("rank_share"))
      .orderBy(col("rank_micro").desc, col("service"))
  }

  /** The identical recurrence, iterations unrolled as chained CTEs. */
  def pageRankSql(iters: Int = 10): String = {
    val head =
      s"""WITH e AS (
         |  SELECT
         |    CASE WHEN user_id % 3 = 0 THEN 'web'
         |         WHEN user_id % 3 = 1 THEN 'mobile' ELSE 'api-gw' END AS src,
         |    CASE WHEN event_type = 'view' THEN 'catalog'
         |         WHEN event_type = 'click' THEN 'frontend'
         |         WHEN event_type = 'signup' THEN 'auth'
         |         WHEN event_type = 'purchase' THEN 'payment'
         |         WHEN user_id % 2 = 0 THEN 'payment' ELSE 'catalog' END AS dst,
         |    count(*) AS w
         |  FROM events GROUP BY 1, 2),
         |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |nn AS (SELECT count(*) AS n FROM nodes),
         |norm AS (
         |  SELECT e.src, e.dst, CAST((e.w * ${WS}) // t.wout AS BIGINT) AS wr
         |  FROM e JOIN (SELECT src, sum(w) AS wout FROM e GROUP BY src) t USING (src)),
         |r0 AS (SELECT node, CAST(CAST(${S} AS BIGINT) // n AS BIGINT) AS r FROM nodes CROSS JOIN nn)""".stripMargin
    val steps = (1 to iters).map { i =>
      s"""r$i AS (
         |  SELECT nodes.node,
         |    CAST((15 * CAST(${S} AS BIGINT)) // (100 * nn.n)
         |      + (85 * coalesce(f.inflow, 0)) // 100 AS BIGINT) AS r
         |  FROM nodes CROSS JOIN nn
         |  LEFT JOIN (
         |    SELECT norm.dst AS node,
         |      CAST(sum((p.r * norm.wr) // ${WS}) AS BIGINT) AS inflow
         |    FROM norm JOIN r${i - 1} p ON norm.src = p.node
         |    GROUP BY norm.dst) f ON nodes.node = f.node)""".stripMargin
    }
    s"""$head,
       |${steps.mkString(",\n")}
       |SELECT node AS service, r AS rank_micro,
       |  round(CAST(r AS DOUBLE) / ${S}, 6) AS rank_share
       |FROM r$iters
       |ORDER BY rank_micro DESC, service""".stripMargin
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** E104 — Bradley-Terry preference-strength fit (Bradley & Terry 1952;
  * Hunter 2004's MM algorithm): turn pairwise "A beat B" outcomes into
  * a per-player strength scale. In a data pipeline the players are the
  * CORPUS SOURCES and the matches come from the E101 judge: within each
  * language, adjacent documents in the quality ranking form a match won
  * by the higher-ranked one whenever the two docs come from different
  * sources — the aggregate answer to "which source wins head-to-head
  * quality comparisons", which is what mixture weighting actually wants
  * (win-RATE alone ignores opponent strength; BT corrects for it).
  *
  * The MM recurrence p_i ← W_i / Σ_j N_ij/(p_i+p_j) runs in EXACT
  * INTEGER arithmetic (the C81 k-means discipline): strengths live in
  * micro-units, every division is a floor over positive longs, each
  * round renormalizes to mean `Scale` and clamps to [1, Cap] so all
  * intermediates stay far from BIGINT range (documented bound: ≤ ~9e6
  * wins per source at Big = 1e12 — far beyond any per-source match
  * count the adjacency pairing can produce, which is ≤ docs-per-lang).
  * Loop vs the oracle's unrolled-CTE replay agreeing bit-for-bit is the
  * strongest available check for an iterative fit.
  *
  * Scale shape: match generation is ONE (lang)-partitioned window
  * (lag over the rank order the E101 pairing already pays for) + one
  * map-side-combined (winner, loser) aggregate — the only exchange is
  * source²-bounded. The fit itself iterates on the collected matrix
  * (sources² rows — plan-sized, the PQ-codebook bounded-collect
  * contract); document text never leaves the executors.
  */
object Preference {

  private val Scale = 1000000L       // strengths in micro-units
  private val Big   = 1000000000000L // division scale (1e12)
  private val Cap   = 100000000000L  // 1e5x odds clamp keeps renorm in range

  def bradleyTerry(spark: SparkSession, dir: String, iters: Int = 10): DataFrame = {
    val w = Window.partitionBy(col("lang")).orderBy(col("q").desc, col("doc_id"))
    val winPairs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"),
        round(graft.functions.TextFns.qualityScore(col("text")), 4).as("q"))
      .withColumn("prev_src", lag(col("source"), 1).over(w))
      .filter(col("prev_src").isNotNull && col("prev_src") =!= col("source"))
      .groupBy(col("prev_src").as("winner"), col("source").as("loser"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))

    val srcs = (winPairs.map(_._1) ++ winPairs.map(_._2)).distinct.sorted.toSeq
    if (srcs.isEmpty) {
      import spark.implicits._
      return Seq.empty[(String, Long, Long, Long, Long)]
        .toDF("source", "wins", "games", "strength", "bt_rank")
    }
    val winTot = srcs.map(s => s -> winPairs.filter(_._1 == s).map(_._3).sum).toMap
    val games = srcs.map(i => i -> srcs.map(j =>
      j -> (winPairs.filter(t => t._1 == i && t._2 == j).map(_._3).sum +
            winPairs.filter(t => t._1 == j && t._2 == i).map(_._3).sum)).toMap).toMap
    val gamesTot = srcs.map(s => s -> games(s).values.sum).toMap

    val nS = srcs.size.toLong
    var p: Map[String, Long] = srcs.map(_ -> Scale).toMap
    for (_ <- 1 to iters) {
      val upd = srcs.map { i =>
        val d = srcs.filter(j => j != i && games(i)(j) > 0)
          .map(j => games(i)(j) * Big / (p(i) + p(j))).sum
        i -> (if (d == 0L) p(i)
              else math.min(Cap, math.max(1L, winTot(i) * Big / d)))
      }.toMap
      val tot = upd.values.sum
      p = upd.map { case (s, v) => s -> math.max(1L, v * nS * Scale / tot) }
    }

    val rows = srcs.sortBy(s => (-p(s), s)).zipWithIndex.map { case (s, i) =>
      (s, winTot(s), gamesTot(s), p(s), (i + 1).toLong)
    }
    spark.createDataFrame(rows)
      .toDF("source", "wins", "games", "strength", "bt_rank")
      .orderBy(col("bt_rank"))
  }

  /** The identical recurrence with the MM rounds unrolled as chained
    * CTEs (the C81 / E10c device); `//` floor-divisions mirror the
    * Scala long divisions operand for operand.
    */
  def bradleyTerrySql(iters: Int = 10): String = {
    val head =
      """WITH t AS (SELECT doc_id, lang, source, string_split(text, ' ') AS w FROM documents),
        |s AS (
        |  SELECT doc_id, lang, source,
        |    round(ln(CAST(len(w) AS DOUBLE) + 1)
        |      * (CAST(len(list_distinct(w)) AS DOUBLE) / len(w))
        |      * (1.0 - CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE) / len(w)), 4) AS q
        |  FROM t),
        |m AS (
        |  SELECT lang, source,
        |    lag(source) OVER (PARTITION BY lang ORDER BY q DESC, doc_id) AS prev_src
        |  FROM s),
        |winpairs AS MATERIALIZED (
        |  SELECT prev_src AS winner, source AS loser, CAST(count(*) AS BIGINT) AS n
        |  FROM m WHERE prev_src IS NOT NULL AND prev_src <> source
        |  GROUP BY 1, 2),
        |nm AS MATERIALIZED (
        |  SELECT i, j, CAST(sum(n) AS BIGINT) AS g FROM (
        |    SELECT winner AS i, loser AS j, n FROM winpairs
        |    UNION ALL SELECT loser AS i, winner AS j, n FROM winpairs)
        |  GROUP BY 1, 2),
        |srcs AS MATERIALIZED (SELECT DISTINCT i AS source FROM nm),
        |wtot AS MATERIALIZED (SELECT winner AS source, CAST(sum(n) AS BIGINT) AS wins
        |         FROM winpairs GROUP BY 1),
        |gtot AS (SELECT i AS source, CAST(sum(g) AS BIGINT) AS games FROM nm GROUP BY 1),
        |p0 AS MATERIALIZED (SELECT source, CAST(1000000 AS BIGINT) AS p FROM srcs)""".stripMargin
    val steps = (1 to iters).map { k =>
      s"""d$k AS MATERIALIZED (
         |  SELECT nm.i AS source,
         |    sum((nm.g * 1000000000000) // (pi.p + pj.p)) AS d
         |  FROM nm JOIN p${k - 1} pi ON pi.source = nm.i
         |          JOIN p${k - 1} pj ON pj.source = nm.j
         |  GROUP BY 1),
         |u$k AS MATERIALIZED (
         |  SELECT p.source,
         |    CASE WHEN coalesce(d.d, 0) = 0 THEN p.p
         |         ELSE least(100000000000, greatest(1,
         |           (coalesce(w.wins, 0) * 1000000000000) // d.d)) END AS p
         |  FROM p${k - 1} p LEFT JOIN d$k d USING (source)
         |                   LEFT JOIN wtot w USING (source)),
         |p$k AS MATERIALIZED (
         |  SELECT source,
         |    CAST(greatest(1, ((p * (SELECT count(*) FROM srcs)) * 1000000)
         |      // (SELECT sum(p) FROM u$k)) AS BIGINT) AS p
         |  FROM u$k)""".stripMargin
    }
    s"""$head,
       |${steps.mkString(",\n")}
       |SELECT s.source AS source,
       |  CAST(coalesce(w.wins, 0) AS BIGINT) AS wins,
       |  g.games AS games, p.p AS strength,
       |  CAST(row_number() OVER (ORDER BY p.p DESC, s.source) AS BIGINT) AS bt_rank
       |FROM srcs s JOIN p$iters p USING (source)
       |  LEFT JOIN wtot w USING (source) JOIN gtot g USING (source)
       |ORDER BY bt_rank""".stripMargin
  }
}

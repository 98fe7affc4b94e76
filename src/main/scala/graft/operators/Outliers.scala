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

  /** ★ `q_outlier_scores` (r13, was ☆) — the k most anomalous events.
    * Counter-based fit + rounded scores + id tiebreak: deterministic
    * across runs/JVMs, and — since every draw is a pure function of
    * (seed, tree, purpose, index) — replayable whole in DuckDB
    * (outlierScoresSql builds the same 64 trees level-by-level).
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

  /** Full DuckDB replica of the fit + scoring path. The counter-based
    * draw schedule (IsoForest.rnd: splitmix-finalizer over (seed,
    * tree, purpose, index)) is recomputed with the E2 oracle's exact
    * 64-bit HUGEINT wrapping arithmetic; trees build level-by-level
    * (the leaf rule — size ≤ 1 / degenerate range / depth cap — is
    * membership-local, so each level is one grouped aggregate); events
    * walk the 8 unrolled levels; per-(event, tree) path lengths fold
    * IN TREE ORDER like Forest.score's accumulation; c(n) values are
    * emitted as the exact JVM literals so no cross-libm ln enters the
    * replica. Depth cap 8 is ceil(log2 256) — valid while the spread
    * sample holds ≥ 256 rows (true at every oracle SF); an undersized
    * sample poisons every score to NULL so the divergence from the
    * JVM's derived depth fails the gate loudly instead of silently.
    */
  val outlierScoresSql: String = {
    val nTrees = 64
    val maxDepth = 8
    val cof = (0 to 256).map(k => s"(${k}, ${graft.plans.IsoForest.cOf(k)})").mkString(", ")
    val macros =
      """CREATE OR REPLACE MACRO mul64(a, b) AS
        |  ((a % 4294967296) * (b % 4294967296)
        |   + (((a % 4294967296) * (b // 4294967296) + (a // 4294967296) * (b % 4294967296)) % 4294967296)
        |     * 4294967296) % 18446744073709551616;
        |CREATE OR REPLACE MACRO x33(v) AS xor(v, v // 8589934592);
        |CREATE OR REPLACE MACRO fmix64(v) AS
        |  x33(mul64(x33(mul64(x33(v), 18397679294719823053::HUGEINT)), 14181476777654086739::HUGEINT));
        |CREATE OR REPLACE MACRO u64w(a) AS a % 18446744073709551616::HUGEINT;
        |CREATE OR REPLACE MACRO iso_rnd(t, p, i) AS
        |  fmix64(u64w(fmix64(u64w(42::HUGEINT + mul64(11400714819323198485::HUGEINT, CAST(t AS HUGEINT) + 1)))
        |    + mul64(14029467366897019727::HUGEINT, CAST(p AS HUGEINT)) + CAST(i AS HUGEINT) + 1));
        |CREATE OR REPLACE MACRO iso_unit(u) AS CAST(u // 2048 AS DOUBLE) / 9007199254740992.0;
        |""".stripMargin
    val sampleSql =
      s"""CREATE OR REPLACE TEMP TABLE iso_ev AS
         |SELECT event_id,
         |  [CAST(value AS DOUBLE), CAST(date_part('hour', ts) AS DOUBLE),
         |   CAST(date_part('dow', ts) + 1 AS DOUBLE)] AS fx
         |FROM events;
         |CREATE OR REPLACE TEMP TABLE iso_smp AS
         |SELECT row_number() OVER (ORDER BY event_id) - 1 AS sidx, fx
         |FROM (SELECT event_id, fx FROM iso_ev
         |      WHERE event_id % (SELECT greatest(1, count(*) // 4096) FROM iso_ev) = 0
         |      ORDER BY event_id LIMIT 4096);
         |CREATE OR REPLACE TEMP TABLE iso_n AS SELECT count(*) AS ns FROM iso_smp;
         |-- draw schedules MATERIALIZED FLAT before any join/aggregate:
         |-- the HUGEINT macro chain evaluates ~10x slower inside join or
         |-- aggregate operators (the E2-oracle finding), and the level
         |-- aggregates would otherwise re-evaluate it per member row
         |CREATE OR REPLACE TEMP TABLE iso_subidx AS
         |SELECT t, j, CAST(iso_rnd(t, 0, j) % (SELECT ns FROM iso_n) AS BIGINT) AS sidx
         |FROM (SELECT t.range AS t, j.range AS j FROM range($nTrees) t, range(256) j
         |      WHERE j.range < (SELECT least(256, ns) FROM iso_n));
         |CREATE OR REPLACE TEMP TABLE iso_sched AS
         |SELECT t, node,
         |  CAST(iso_rnd(t, 1, node) % 3 AS INT) + 1 AS f,
         |  iso_unit(iso_rnd(t, 2, node)) AS frac
         |FROM (SELECT t.range AS t, n.range AS node
         |      FROM range($nTrees) t, range(${(1 << (maxDepth + 1)) - 1}) n);
         |CREATE OR REPLACE TEMP TABLE iso_m0 AS
         |SELECT i.t, i.j, s.fx, 0 AS node
         |FROM iso_subidx i JOIN iso_smp s USING (sidx);
         |""".stripMargin
    val levels = (0 until maxDepth).map { d =>
      s"""CREATE OR REPLACE TEMP TABLE iso_ns$d AS
         |SELECT m.t, m.node, s.f, count(*) AS cnt,
         |  min(m.fx[s.f]) AS lo, max(m.fx[s.f]) AS hi
         |FROM iso_m$d m JOIN iso_sched s ON s.t = m.t AND s.node = m.node
         |GROUP BY m.t, m.node, s.f;
         |CREATE OR REPLACE TEMP TABLE iso_nd$d AS
         |SELECT n.*, n.cnt > 1 AND n.lo < n.hi AS internal,
         |  n.lo + s.frac * (n.hi - n.lo) AS split
         |FROM iso_ns$d n JOIN iso_sched s ON s.t = n.t AND s.node = n.node;
         |CREATE OR REPLACE TEMP TABLE iso_m${d + 1} AS
         |SELECT m.t, m.j, m.fx,
         |  CASE WHEN n.internal AND m.fx[n.f] < n.split THEN 2 * m.node + 1
         |       WHEN n.internal THEN 2 * m.node + 2
         |       ELSE m.node END AS node
         |FROM iso_m$d m JOIN iso_nd$d n USING (t, node);
         |""".stripMargin
    }.mkString
    val walk = (0 until maxDepth).map { d =>
      s"""CREATE OR REPLACE TEMP TABLE iso_w${d + 1} AS
         |SELECT w.event_id, w.t,
         |  CASE WHEN i.node IS NULL THEN w.node
         |       WHEN e.fx[i.f] < i.split THEN 2 * w.node + 1
         |       ELSE 2 * w.node + 2 END AS node,
         |  w.depth + CASE WHEN i.node IS NULL THEN 0 ELSE 1 END AS depth
         |FROM iso_w$d w
         |JOIN iso_ev e USING (event_id)
         |LEFT JOIN iso_int i ON i.t = w.t AND i.node = w.node;
         |""".stripMargin
    }.mkString
    macros + sampleSql + levels +
      s"""CREATE OR REPLACE TEMP TABLE iso_int AS
         |${(0 until maxDepth).map(d =>
             s"SELECT t, node, f, split FROM iso_nd$d WHERE internal").mkString("\n", "\nUNION ALL\n", ";\n")}
         |CREATE OR REPLACE TEMP TABLE iso_leaf AS
         |SELECT t, node, count(*) AS leafn FROM iso_m$maxDepth GROUP BY t, node;
         |CREATE OR REPLACE TEMP TABLE iso_cof AS
         |SELECT * FROM (VALUES $cof) v(k, c);
         |CREATE OR REPLACE TEMP TABLE iso_w0 AS
         |SELECT e.event_id, t.range AS t, 0 AS node, 0 AS depth FROM iso_ev e, range($nTrees) t;
         |$walk
         |CREATE OR REPLACE TEMP TABLE iso_pl AS
         |SELECT w.event_id, w.t,
         |  CAST(w.depth AS DOUBLE) + cf.c AS pl
         |FROM iso_w$maxDepth w
         |LEFT JOIN iso_leaf l ON l.t = w.t AND l.node = w.node
         |JOIN iso_cof cf ON cf.k = coalesce(l.leafn, 0);
         |WITH scored AS (
         |  -- halt poison (the dedupSubstringSql device): this replica
         |  -- hardcodes maxDepth=$maxDepth = ceil(log2 256), valid ONLY
         |  -- while the spread sample holds >= 256 rows (IsoForest.fit
         |  -- derives depth from min(256, |sample|)); an undersized
         |  -- sample must break the hash loudly, not diverge silently
         |  SELECT event_id,
         |    CASE WHEN (SELECT ns FROM iso_n) < 256 THEN NULL ELSE
         |    round(pow(2.0,
         |      -(list_reduce(list_prepend(0.0, list(pl ORDER BY t)), (a, b) -> a + b)
         |        / $nTrees.0)
         |      / (SELECT c FROM iso_cof WHERE k = (SELECT least(256, ns) FROM iso_n))), 6)
         |    END AS score
         |  FROM iso_pl GROUP BY event_id)
         |SELECT event_id, score,
         |  CAST(row_number() OVER (ORDER BY score DESC, event_id) AS BIGINT) AS rank
         |FROM scored
         |ORDER BY score DESC, event_id
         |LIMIT 20""".stripMargin
  }
}

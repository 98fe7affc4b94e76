package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.ApacheLog
import graft.sources.LogLines

/** Network-range enrichment (SURVEY §2 C41).
  *
  * The reference's dashboards segment traffic by client network — the
  * unified-log use case maps B1's parsed client IPs onto CIDR-style
  * address blocks (GeoIP / allocation tables are range keyed, not
  * equi-keyed, so C9's equi-join enrichment can't express it).
  *
  * Scale design — prefix-bucketed range join, NOT a cross join: a
  * BETWEEN-only join degenerates to BroadcastNestedLoopJoin (every row
  * against every block). Instead each block is EXPLODED onto the /16
  * buckets it overlaps (a block spans ≤4 here; GeoIP blocks are almost
  * always sub-/16), each event computes its /16 bucket with one shift,
  * and the join is an EQUI-join on the bucket with the residual
  * `BETWEEN` as a post-join filter. Catalyst picks BroadcastHashJoin
  * (the exploded dim stays tiny); on a 100 TB fact side the probe is
  * map-side with zero fact shuffle — the aggregation afterwards is the
  * only exchange.
  */
object Network {

  /** 10.0.0.0/8 block table: 64 slots of 4×/16 each; block i occupies
    * the low (i%4)+1 /16s of its slot, so widths vary 1–4 /16s and
    * ~37% of the space is intentionally unrouted (inner-join drops it,
    * like an IP absent from a GeoIP table).
    */
  val nBlocks = 64
  private val base = 10L << 24
  private val slot = 1L << 18 // 4 /16s per slot

  def ipBlocks(spark: SparkSession): DataFrame =
    spark.range(nBlocks).select(
      concat(lit("blk-"), lpad(col("id").cast("string"), 2, "0")).as("block"),
      (col("id") * slot + base).as("ip_start"),
      (col("id") * slot + base + (col("id") % 4 + 1) * 65536L - 1).as("ip_end"))

  /** Dotted-quad string → 32-bit integer, pure builtin arithmetic. */
  def ipToInt(ip: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val o = split(ip, "\\.")
    element_at(o, 1).cast("long") * 16777216L +
      element_at(o, 2).cast("long") * 65536L +
      element_at(o, 3).cast("long") * 256L +
      element_at(o, 4).cast("long")
  }

  /** C41 — requests and distinct clients per network block, from the
    * PARSED access-log ip (the full B1 path, not the synthesis cols).
    */
  def ipEnrich(spark: SparkSession, dir: String): DataFrame = {
    // coalesce pins ip_int (and so bucket) NON-NULLABLE: otherwise the
    // inner join infers an isnotnull(bucket) filter and pushes it below
    // the projections, inlining the whole line-synthesis + regex parse
    // into the scan filter ~8x per row (measured 6.5 s -> this shape's
    // one-regex-per-row cost at sf0.1). -1 can't fall in any block.
    val evs = LogLines.apacheLines(spark, dir)
      .select(ApacheLog.ip(col("line")).as("ip"))
      .withColumn("ip_int", coalesce(ipToInt(col("ip")), lit(-1L)))
      .withColumn("bucket", shiftright(col("ip_int"), 16))
    val blocks = ipBlocks(spark)
      .withColumn("bucket",
        explode(sequence(shiftright(col("ip_start"), 16), shiftright(col("ip_end"), 16))))
    evs.join(blocks, Seq("bucket"))
      .filter(col("ip_int").between(col("ip_start"), col("ip_end")))
      .groupBy(col("block"))
      // distinct on the LONG, not the dotted string — bijective, and the
      // distinct-aggregate's expand/shuffle carries 8 bytes instead of a
      // 7-15 char UTF8String
      .agg(count(lit(1)).as("n"), countDistinct(col("ip_int")).as("n_ips"))
      .orderBy(col("block"))
  }

  /** DuckDB oracle: plain BETWEEN range join over the same block table,
    * ips derived straight from the events columns (no shared code).
    */
  val ipEnrichSql: String =
    """WITH ips AS (
      |  SELECT 167772160 + (user_id % 256) * 65536 + (event_id % 250) * 256 + (event_id * 7) % 250 AS ip_int
      |  FROM events),
      |blocks AS (
      |  SELECT concat('blk-', lpad(CAST(i AS VARCHAR), 2, '0')) AS block,
      |         167772160 + i * 262144 AS ip_start,
      |         167772160 + i * 262144 + (i % 4 + 1) * 65536 - 1 AS ip_end
      |  FROM range(64) t(i))
      |SELECT b.block, count(*) AS n, count(DISTINCT e.ip_int) AS n_ips
      |FROM ips e JOIN blocks b ON e.ip_int BETWEEN b.ip_start AND b.ip_end
      |GROUP BY 1
      |ORDER BY block""".stripMargin

  /** C2l — ip_range agg (OpenSearch `ip_range`): requests bucketed by
    * user-supplied address ranges — the "which quarter of our address
    * space" tile, range-keyed like C41 but with FIXED user bounds, so
    * it needs no block table at all: one conditional label over the
    * parsed ip's integer form in the scan projection, one map-side-
    * combined aggregate. Bounds are /10 quarters of the 10.0.0.0/8
    * space the synthetic fleet lives in.
    */
  def ipRangeAgg(spark: SparkSession, dir: String): DataFrame = {
    val q = 1L << 22 // a /10: quarter of the /8
    val ipInt = ipToInt(ApacheLog.ip(col("line")))
    val off = ipInt - lit(10L << 24)
    val bucket = when(off < q, "10.0.0.0/10")
      .when(off < 2 * q, "10.64.0.0/10")
      .when(off < 3 * q, "10.128.0.0/10")
      .otherwise("10.192.0.0/10")
    LogLines.apacheLines(spark, dir)
      .select(bucket.as("bucket"), ipInt.as("ip_int"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), countDistinct(col("ip_int")).as("n_ips"))
      .orderBy(col("bucket"))
  }

  /** C2p — ip_prefix agg (OpenSearch 2.x `ip_prefix`): bucket by the
    * /k network prefix of the parsed client IP at a configurable
    * prefix length — C2l's fixed user ranges generalized to EVERY /k
    * subnet (the network dashboard's "which subnets are talking"
    * tile; reference anchor: README:295-314 Discover workflows over
    * the unified log index). One shift-pair mask in the scan
    * projection, one map-side-combined aggregate keyed on the masked
    * integer; the dotted-quad "a.b.c.d/k" label is derived from the
    * mask with pure arithmetic, so the whole bucket key stays codegen
    * and the agg is the only exchange at any scale.
    */
  def ipPrefixAgg(spark: SparkSession, dir: String, prefixLen: Int = 18): DataFrame = {
    require(prefixLen >= 1 && prefixLen <= 32, s"bad prefix length $prefixLen")
    val shift = 32 - prefixLen
    // parse ip_int ONCE in its own projection; the label derives from
    // the attribute, so the regex parse isn't textually inlined into
    // every octet (CollapseProject keeps non-cheap exprs uncollapsed)
    val masked = shiftleft(shiftright(col("ip_int"), shift), shift)
    val label = concat(
      (shiftright(masked, 24) % 256).cast("string"), lit("."),
      (shiftright(masked, 16) % 256).cast("string"), lit("."),
      (shiftright(masked, 8) % 256).cast("string"), lit("."),
      (masked % 256).cast("string"), lit(s"/$prefixLen"))
    LogLines.apacheLines(spark, dir)
      .select(ipToInt(ApacheLog.ip(col("line"))).as("ip_int"))
      .select(label.as("prefix"), col("ip_int"))
      .groupBy(col("prefix"))
      .agg(count(lit(1)).as("n"), countDistinct(col("ip_int")).as("n_ips"))
      .orderBy(col("prefix"))
  }

  /** DuckDB oracle: same mask by integer division (2^14 for /18), ips
    * derived straight from the events columns (no shared code).
    */
  val ipPrefixAggSql: String =
    """WITH ips AS (
      |  SELECT 167772160 + (user_id % 256) * 65536 + (event_id % 250) * 256 + (event_id * 7) % 250 AS ip_int
      |  FROM events),
      |m AS (SELECT ip_int, (ip_int // 16384) * 16384 AS masked FROM ips)
      |SELECT concat(CAST((masked // 16777216) % 256 AS VARCHAR), '.',
      |              CAST((masked // 65536) % 256 AS VARCHAR), '.',
      |              CAST((masked // 256) % 256 AS VARCHAR), '.',
      |              CAST(masked % 256 AS VARCHAR), '/18') AS prefix,
      |  count(*) AS n, count(DISTINCT ip_int) AS n_ips
      |FROM m
      |GROUP BY 1
      |ORDER BY prefix""".stripMargin

  val ipRangeAggSql: String =
    """WITH ips AS (
      |  SELECT (user_id % 256) * 65536 + (event_id % 250) * 256 + (event_id * 7) % 250 AS off,
      |         167772160 + (user_id % 256) * 65536 + (event_id % 250) * 256 + (event_id * 7) % 250 AS ip_int
      |  FROM events)
      |SELECT CASE WHEN off < 4194304 THEN '10.0.0.0/10'
      |            WHEN off < 8388608 THEN '10.64.0.0/10'
      |            WHEN off < 12582912 THEN '10.128.0.0/10'
      |            ELSE '10.192.0.0/10' END AS bucket,
      |  count(*) AS n, count(DISTINCT ip_int) AS n_ips
      |FROM ips
      |GROUP BY 1
      |ORDER BY bucket""".stripMargin
}

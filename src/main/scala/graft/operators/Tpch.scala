package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.sources.Tables

/** General batch analytics (SURVEY §2 D-block).
  *
  * TPC-H-shaped queries over the star schema — the "engine
  * completeness" block: wide aggregation, selective filter-agg,
  * broadcast + shuffle joins, snowflake joins, decorrelated
  * threshold joins, window functions.
  *
  * Scale notes: dims (region/nation/customer/supplier/part) are
  * explicitly broadcast — at 100 TB the fact tables shuffle on join
  * keys only after pushed-down predicates prune, and every groupBy
  * is partial-aggregated map-side by Catalyst.
  */
object Tpch {

  /** D1 — TPCH Q1 shape: wide aggregation over lineitem.
    * Doubles rounded at the end of the plan only (oracle display parity).
    */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val pricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  round(avg(l_extendedprice), 4) AS avg_price,
      |  round(avg(l_discount), 4) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** D2 — TPCH Q6 shape: selective filter + single aggregate.
    * All three predicates push down to the parquet scan.
    */
  def revenueFilter(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"))
  }

  val revenueFilterSql: String =
    """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  /** D3 — TPCH Q3 shape: customer ⋈ orders ⋈ lineitem, top-10 revenue.
    * customer is broadcast (small dim); orders⋈lineitem shuffles on
    * orderkey. Deterministic output: tiebreak on o_orderkey.
    */
  def shippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1997-03-15").cast("timestamp")
    val cust = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord  = Tables.orders(spark, dir).filter(col("o_orderdate") < cutoff)
    val li   = Tables.lineitem(spark, dir).filter(col("l_shipdate") > cutoff)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val shippingPrioritySql: String =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING'
      |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** D4 — TPCH Q5 shape: snowflake join through
    * region→nation→customer→orders→lineitem→supplier.
    * Note: testdata has no s_nationkey/c_nationkey co-constraint on
    * lineitem↔supplier beyond keys, so the classic
    * "c_nationkey = s_nationkey" predicate applies as-is.
    * All dims broadcast; only orders⋈lineitem shuffles.
    */
  def localSupplierVolume(spark: SparkSession, dir: String): DataFrame = {
    val reg  = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val nat  = Tables.nation(spark, dir)
    val cust = Tables.customer(spark, dir)
    val sup  = Tables.supplier(spark, dir)
    val ord = Tables.orders(spark, dir).filter(
      col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
      col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val li = Tables.lineitem(spark, dir)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(cust),
        col("o_custkey") === col("c_custkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val localSupplierVolumeSql: String =
    """SELECT n_name,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** D5 — TPCH Q17 shape: decorrelated per-part average threshold.
    * The correlated subquery becomes a self-aggregate + join —
    * the scalable plan (one shuffle on l_partkey, broadcast part dim).
    */
  def smallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val pt = Tables.part(spark, dir)
    val avgQty = li.groupBy(col("l_partkey").as("a_partkey"))
      .agg((avg(col("l_quantity")) * 0.5).as("half_avg_qty"))
    li.join(broadcast(pt), col("l_partkey") === col("p_partkey"))
      .join(avgQty, col("l_partkey") === col("a_partkey"))
      .filter(col("l_quantity") < col("half_avg_qty"))
      .agg(round(sum(col("l_extendedprice")) / 7.0, 2).as("avg_yearly"))
  }

  val smallQtyRevenueSql: String =
    """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
      |FROM lineitem
      |JOIN part ON p_partkey = l_partkey
      |JOIN (SELECT l_partkey AS a_partkey, avg(l_quantity) * 0.5 AS half_avg_qty
      |      FROM lineitem GROUP BY l_partkey) t ON l_partkey = a_partkey
      |WHERE l_quantity < half_avg_qty""".stripMargin

  /** D6 — running revenue per supplier (window running total + rank).
    * Deterministic: window ordered by (l_shipdate, l_orderkey,
    * l_linenumber) — a unique key.
    */
  def runningRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).filter(col("l_suppkey") <= 5)
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    li.select(
        col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        round(sum(col("l_extendedprice")).over(w), 2).as("running_rev"))
      .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
  }

  val runningRevenueSql: String =
    """SELECT l_suppkey, l_orderkey, l_linenumber,
      |  round(sum(l_extendedprice) OVER (
      |    PARTITION BY l_suppkey
      |    ORDER BY l_shipdate, l_orderkey, l_linenumber
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_rev
      |FROM lineitem
      |WHERE l_suppkey <= 5
      |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin

  /** D10 — late-shipment priority counts (TPCH Q4 shape, commitdate-free
    * variant): orders with at least one lineitem shipped more than 60
    * days after the order date, counted by priority — a left-semi join
    * against a derived fact slice, aggregated per group.
    */
  def latePriorityCounts(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val late = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_shipdate"))
    o.join(late,
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  val latePriorityCountsSql: String =
    """SELECT o_orderpriority, count(*) AS n_orders
      |FROM orders
      |WHERE EXISTS (
      |  SELECT 1 FROM lineitem
      |  WHERE l_orderkey = o_orderkey
      |    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** D7 — returned-item customers (TPCH Q10 shape): revenue lost to
    * returns per customer over a year, top 20. Fact-fact join on
    * orderkey after pushed filters; customer/nation dims broadcast.
    *
    * D7–D9 money arithmetic runs in EXACT integer micro-dollars
    * (prices are 2-decimal, discounts 4-decimal): float summation is
    * order-dependent across engines, and with a thousand groups some
    * group lands on a rounding boundary — integer sums are exact and
    * convert to the identical double everywhere.
    */
  def returnedItems(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir).filter(col("l_returnflag") === "R")
    // half-open date range, NOT year(o_orderdate)===1996: a function-
    // wrapped column is a residual filter the parquet reader can't use,
    // so every row group of a 100 TB orders table would be decoded; the
    // range form reaches PushedFilters and prunes on min-max stats
    // (EntrySpec asserts the pushdown).
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    // top-20 via orderBy().limit(): Spark plans TakeOrderedAndProject —
    // each partition keeps a bounded 20-row heap and only those rows
    // reach the driver-side merge, vs a rank window which moves the
    // ENTIRE customer aggregate into one partition to sort. The rank
    // column is a window over the 20 surviving rows (free).
    val top = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg((sum(round(col("l_extendedprice") * 100).cast("long") *
          (lit(10000L) - round(col("l_discount") * 10000).cast("long")))
        .cast("double") / 1e6).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
    val w = Window.orderBy(col("revenue").desc, col("c_custkey"))
    top.withColumn("rank", row_number().over(w).cast("long"))
      .orderBy(col("rank"))
  }

  val returnedItemsSql: String =
    """WITH rev AS (
      |  SELECT c_custkey, c_name, n_name,
      |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (10000 - CAST(round(l_discount * 10000) AS BIGINT))) AS DOUBLE) / 1000000.0 AS revenue
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  WHERE l_returnflag = 'R' AND year(o_orderdate) = 1996
      |  GROUP BY c_custkey, c_name, n_name),
      |ranked AS (
      |  SELECT *, CAST(row_number() OVER (ORDER BY revenue DESC, c_custkey) AS BIGINT) AS rank
      |  FROM rev)
      |SELECT c_custkey, c_name, n_name, revenue, rank
      |FROM ranked WHERE rank <= 20
      |ORDER BY rank""".stripMargin

  /** D8 — international trade volume (TPCH Q7 shape): revenue shipped
    * across nation borders (supplier nation ≠ customer nation), by
    * nation pair and year — the full matrix rather than one fixed pair
    * so the query is non-degenerate at every scale factor. Supplier
    * and customer nations resolve through broadcast dims; the
    * fact-fact join shuffles on orderkey once.
    */
  def nationVolume(spark: SparkSession, dir: String,
                   fromYear: Int = 1996, untilYear: Int = 1999): DataFrame = {
    val n = Tables.nation(spark, dir).select(col("n_nationkey"), col("n_name"))
    val s = Tables.supplier(spark, dir)
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val c = Tables.customer(spark, dir)
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val o = Tables.orders(spark, dir)
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("cust_nation"))
    Tables.lineitem(spark, dir)
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      // range predicate pushes to the lineitem scan (row-group pruning);
      // year() survives only in the groupBy projection below.
      .filter(col("l_shipdate") >= lit(s"$fromYear-01-01").cast("timestamp") &&
        col("l_shipdate") < lit(s"$untilYear-01-01").cast("timestamp"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg((sum(round(col("l_extendedprice") * 100).cast("long") *
          (lit(10000L) - round(col("l_discount") * 10000).cast("long")))
        .cast("double") / 1e6).as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  val nationVolumeSql: String =
    """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
      |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
      |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (10000 - CAST(round(l_discount * 10000) AS BIGINT))) AS DOUBLE) / 1000000.0 AS revenue
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation sn ON s_nationkey = sn.n_nationkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation cn ON c_nationkey = cn.n_nationkey
      |WHERE sn.n_name <> cn.n_name
      |  AND year(l_shipdate) >= 1996 AND year(l_shipdate) < 1999
      |GROUP BY 1, 2, 3
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** D9 — product-type profit by nation and year (TPCH Q9 shape,
    * partsupp-free variant): revenue of ECONOMY-type parts by the
    * supplying nation per year. part/supplier/nation broadcast; one
    * fact shuffle.
    */
  def productTypeRevenue(spark: SparkSession, dir: String, pType: String = "ECONOMY"): DataFrame = {
    val p = Tables.part(spark, dir).filter(col("p_type") === pType)
      .select(col("p_partkey"))
    val n = Tables.nation(spark, dir).select(col("n_nationkey"), col("n_name"))
    val s = Tables.supplier(spark, dir)
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation"))
    Tables.lineitem(spark, dir)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("nation"), year(col("l_shipdate")).cast("long").as("l_year"))
      .agg((sum(round(col("l_extendedprice") * 100).cast("long") *
          (lit(10000L) - round(col("l_discount") * 10000).cast("long")))
        .cast("double") / 1e6).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("nation"), col("l_year"))
  }

  val productTypeRevenueSql: String =
    """SELECT n_name AS nation, CAST(year(l_shipdate) AS BIGINT) AS l_year,
      |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (10000 - CAST(round(l_discount * 10000) AS BIGINT))) AS DOUBLE) / 1000000.0 AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE p_type = 'ECONOMY'
      |GROUP BY 1, 2
      |ORDER BY nation, l_year""".stripMargin

  /** Integer-cents revenue term — exact longs, so sums are
    * order-independent and ratios divide two exact integers (one
    * correctly-rounded IEEE division → cross-engine deterministic).
    */
  private def centsRevenue: Column =
    round(col("l_extendedprice") * 100).cast("long") *
      (lit(10000L) - round(col("l_discount") * 10000).cast("long"))

  /** D11 — TPCH Q8 shape (national market share): one nation's share of
    * supplier revenue within one region's customer market, per year.
    * All dims broadcast down a snowflake (region→nation→customer and
    * nation→supplier); the only fact-fact shuffle is lineitem⋈orders;
    * the share divides two exact integer-cents sums.
    */
  def marketShare(spark: SparkSession, dir: String,
                  nation: String = "NATION_0", region: String = "ASIA"): DataFrame = {
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir).filter(col("r_name") === region)
      .select(col("r_regionkey"))
    val custInRegion = Tables.customer(spark, dir)
      .join(broadcast(n.join(broadcast(r), col("n_regionkey") === col("r_regionkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"))
    val suppNat = Tables.supplier(spark, dir)
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val o = Tables.orders(spark, dir)
      .join(broadcast(custInRegion), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_orderdate"))
    Tables.lineitem(spark, dir)
      .join(broadcast(suppNat), col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(round(
        sum(when(col("supp_nation") === nation, centsRevenue).otherwise(0L)).cast("double") /
          sum(centsRevenue), 6).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  val marketShareSql: String =
    """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |  round(CAST(sum(CASE WHEN sn.n_name = 'NATION_0'
      |      THEN CAST(round(l_extendedprice * 100) AS BIGINT) * (10000 - CAST(round(l_discount * 10000) AS BIGINT))
      |      ELSE 0 END) AS DOUBLE)
      |    / sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (10000 - CAST(round(l_discount * 10000) AS BIGINT))), 6) AS mkt_share
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation sn ON s_nationkey = sn.n_nationkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation cn ON c_nationkey = cn.n_nationkey
      |JOIN region ON cn.n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |GROUP BY 1
      |ORDER BY o_year""".stripMargin

  /** D12 — TPCH Q14 shape (promotion effect): PROMO-type parts' percent
    * of revenue per ship month. One broadcast dim join, conditional
    * exact-cents sums in one aggregation pass.
    */
  def promoRevenue(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir).select(col("p_partkey"), col("p_type"))
    Tables.lineitem(spark, dir)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(date_trunc("month", col("l_shipdate")).as("ship_month"))
      .agg(round(
        sum(when(col("p_type") === "PROMO", centsRevenue).otherwise(0L)).cast("double") * 100 /
          sum(centsRevenue), 6).as("promo_pct"))
      .orderBy(col("ship_month"))
  }

  val promoRevenueSql: String =
    """SELECT date_trunc('month', l_shipdate) AS ship_month,
      |  round(CAST(sum(CASE WHEN p_type = 'PROMO'
      |      THEN CAST(round(l_extendedprice * 100) AS BIGINT) * (10000 - CAST(round(l_discount * 10000) AS BIGINT))
      |      ELSE 0 END) AS DOUBLE) * 100
      |    / sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (10000 - CAST(round(l_discount * 10000) AS BIGINT))), 6) AS promo_pct
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |GROUP BY 1
      |ORDER BY ship_month""".stripMargin

  /** D13 — TPCH Q19 shape (disjunctive brand/quantity bands): three
    * OR'd (brand, quantity-band) conjunctions — the disjunction stays
    * one post-join filter over a single broadcast part join; the scan
    * still prunes on the quantity envelope (1..35) because Catalyst
    * extracts the common bound from the OR.
    */
  def brandBandRevenue(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir).select(col("p_partkey"), col("p_brand"))
    Tables.lineitem(spark, dir)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("l_quantity").between(1, 15)) ||
        (col("p_brand") === "Brand#2" && col("l_quantity").between(10, 25)) ||
        (col("p_brand") === "Brand#3" && col("l_quantity").between(20, 35)))
      .agg(
        (sum(centsRevenue).cast("double") / 1e6).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  val brandBandRevenueSql: String =
    """SELECT
      |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (10000 - CAST(round(l_discount * 10000) AS BIGINT))) AS DOUBLE) / 1000000.0 AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 15)
      |   OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 25)
      |   OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 35)""".stripMargin

  // With D14–D23 the D-block covers all 22 TPC-H query shapes, each
  // re-keyed to the reduced testdata schema (no partsupp / shipmode /
  // commit+receipt dates): lineitem doubles as the supply relation
  // where partsupp is needed, and "late" derives from shipdate vs
  // orderdate. The SHAPES — correlated-min decorrelation, group-vs-
  // global HAVING, left-join distributions, semi/anti self-joins —
  // are the point; they exercise every join strategy the engine has.

  /** D14 — TPCH Q2 shape (min-cost supplier per part): the correlated
    * MIN subquery, decorrelated into aggregate-then-self-join. The
    * supply relation is lineitem collapsed to per-(part, supplier)
    * best offers (one shuffle on the composite key); the per-part min
    * is a second aggregate over the already-small offer set, broadcast
    * back onto it. Unit cost is one IEEE division — bit-identical in
    * both engines, so the min-equality join selects identical rows.
    * All dims broadcast; the fact table shuffles exactly once.
    */
  def minCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    // part filter broadcast-prunes lineitem BEFORE the offer
    // aggregate's composite-key shuffle — only qualifying parts' lines
    // (a few % of the fact table) ever shuffle (1.70 s -> 0.6 s at
    // sf0.1; at 100 TB the difference is the whole job)
    val parts = Tables.part(spark, dir)
      .filter(col("p_type") === "STANDARD" && col("p_size") <= 10)
      .select(col("p_partkey"), col("p_name"))
    val filt = Tables.lineitem(spark, dir)
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_partkey"), col("p_name"), col("l_suppkey"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("cost"))
    val mins = filt.groupBy(col("p_partkey").as("mk")).agg(min(col("cost")).as("min_cost"))
    filt.join(broadcast(mins), col("p_partkey") === col("mk") && col("cost") === col("min_cost"))
      .join(broadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir).select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"), col("p_partkey"),
        col("p_name"), round(col("min_cost"), 4).as("min_cost"))
      .orderBy(col("s_acctbal").desc, col("s_name"), col("p_partkey"))
      .limit(20)
  }

  val minCostSupplierSql: String =
    """WITH offers AS (
      |  SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS cost
      |  FROM lineitem GROUP BY 1, 2),
      |filt AS (
      |  SELECT l_partkey, l_suppkey, cost, p_partkey, p_name
      |  FROM offers JOIN part ON p_partkey = l_partkey
      |  WHERE p_type = 'STANDARD' AND p_size <= 10),
      |mins AS (SELECT l_partkey AS mk, min(cost) AS min_cost FROM filt GROUP BY 1)
      |SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
      |  round(min_cost, 4) AS min_cost
      |FROM filt JOIN mins ON l_partkey = mk AND cost = min_cost
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |ORDER BY s_acctbal DESC, s_name, p_partkey
      |LIMIT 20""".stripMargin

  /** D15 — TPCH Q11 shape (important stock values): per-part value
    * within one region's suppliers, HAVING value above a multiple of
    * the MEAN part value (the group-vs-global-scalar pattern; a
    * fixed fraction would thin to empty as the part count scales, so
    * the threshold is mean-relative — scale-stable by construction).
    * Values are exact integer cents, so the threshold comparison is
    * integer arithmetic — no float sum order to manage. The global
    * total is a one-row broadcast; nothing shuffles twice.
    */
  def importantParts(spark: SparkSession, dir: String): DataFrame = {
    val sup = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir).filter(col("n_regionkey") === 0)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val v = Tables.lineitem(spark, dir)
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("val_c"))
    val tot = v.agg(sum(col("val_c")).as("t"), count(lit(1)).as("n"))
    v.crossJoin(broadcast(tot))
      .filter(col("val_c") * col("n") > col("t") * 2)
      .select(col("l_partkey").as("p_partkey"),
        (col("val_c").cast("double") / 100).as("value"))
      .orderBy(col("value").desc, col("p_partkey"))
  }

  val importantPartsSql: String =
    """WITH v AS (
      |  SELECT l_partkey, CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS val_c
      |  FROM lineitem
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN nation ON n_nationkey = s_nationkey
      |  WHERE n_regionkey = 0
      |  GROUP BY 1),
      |tot AS (SELECT CAST(sum(val_c) AS BIGINT) AS t, count(*) AS n FROM v)
      |SELECT l_partkey AS p_partkey, CAST(val_c AS DOUBLE) / 100 AS value
      |FROM v CROSS JOIN tot
      |WHERE val_c * n > t * 2
      |ORDER BY value DESC, p_partkey""".stripMargin

  /** D16 — TPCH Q12 shape (priority class counts per line group; the
    * testdata has no l_shipmode, so l_returnflag keys the groups and
    * o_orderpriority provides the two classes). One orderkey shuffle
    * join, then conditional counts that partial-aggregate map-side —
    * the two CASE sums ride a single pass.
    */
  def priorityLineCounts(spark: SparkSession, dir: String): DataFrame = {
    val isHigh = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(isHigh, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(isHigh, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy(col("l_returnflag"))
  }

  val priorityLineCountsSql: String =
    """SELECT l_returnflag,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** D17 — TPCH Q13 shape (customer order-count distribution): LEFT
    * join so zero-order customers survive with count 0, then a second
    * aggregate over the per-customer counts. The first groupBy
    * shuffles on custkey (same key as the join — Catalyst reuses the
    * exchange); the second aggregates a customer-cardinality input
    * down to a handful of distribution rows.
    */
  def custOrderDist(spark: SparkSession, dir: String): DataFrame = {
    val ords = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
      .select(col("o_custkey"), col("o_orderkey"))
    Tables.customer(spark, dir).select(col("c_custkey"))
      .join(ords, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val custOrderDistSql: String =
    """SELECT c_count, count(*) AS custdist
      |FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer
      |  LEFT JOIN orders ON o_custkey = c_custkey
      |    AND o_orderpriority <> '4-NOT SPECIFIED'
      |  GROUP BY c_custkey)
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** D18 — TPCH Q15 shape (top supplier by quarterly revenue): the
    * revenue "view" is one suppkey aggregate in exact integer cents;
    * the max is a one-row broadcast and the tie-safe equality select
    * is integer — identical winners in both engines even when two
    * suppliers tie to the cent.
    */
  def topSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
        .cast("long")).as("r_c"))
    rev.crossJoin(broadcast(rev.agg(max(col("r_c")).as("mx"))))
      .filter(col("r_c") === col("mx"))
      .join(broadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        (col("r_c").cast("double") / 100).as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  val topSupplierSql: String =
    """WITH rev AS (
      |  SELECT l_suppkey, CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS r_c
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      |  GROUP BY 1)
      |SELECT s_suppkey, s_name, CAST(r_c AS DOUBLE) / 100 AS total_revenue
      |FROM rev JOIN supplier ON l_suppkey = s_suppkey
      |WHERE r_c = (SELECT max(r_c) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  /** D19 — TPCH Q16 shape (supplier count by part attributes):
    * lineitem stands in for partsupp via a distinct (part, supplier)
    * projection — one composite-key shuffle, reused by the final
    * countDistinct. "Complaint" suppliers (negative balance here)
    * leave via a broadcast anti-join BEFORE the count, the same
    * NOT-IN decorrelation the classic plan wants.
    */
  def supplierPartCount(spark: SparkSession, dir: String): DataFrame = {
    // both dims broadcast into the scan BEFORE the only shuffle: the
    // part filter keeps ~16% of lines and the anti-join drops excluded
    // suppliers' lines map-side, so the countDistinct's expand sees
    // only surviving rows (no separate distinct pre-pass — the
    // two-phase distinct aggregate already dedups (part, supp))
    val excl = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    val parts = Tables.part(spark, dir)
      .filter(col("p_brand") =!= "Brand#13" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 4, 9, 14, 23, 36, 45, 49))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    Tables.lineitem(spark, dir).select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(excl), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  val supplierPartCountSql: String =
    """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
      |JOIN part ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
      |  AND p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** D20 — TPCH Q18 shape (large-volume orders): the HAVING-sum
    * subquery aggregates lineitem on orderkey FIRST (map-side
    * partials collapse ~4 lines/order before the shuffle), and only
    * qualifying orderkeys join back — the join input is the filtered
    * aggregate, not raw lineitem. Quantities are integral doubles, so
    * the threshold is exact.
    */
  def largeOrders(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > 250)
    big.join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
  }

  val largeOrdersSql: String =
    """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
      |FROM (
      |  SELECT l_orderkey, sum(l_quantity) AS sum_qty
      |  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 250) big
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 10""".stripMargin

  /** D21 — TPCH Q20 shape (suppliers with excess shipments of
    * selected parts): nested semi-joins — part-name filter broadcast
    * into lineitem, per-(supplier, part) year volume, threshold, then
    * the surviving supplier set (tiny) broadcast-semi-joins the
    * supplier dim. No step shuffles more than once and the fact scan
    * prunes on the shipdate year.
    */
  def excessSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val redParts = Tables.part(spark, dir)
      .filter(col("p_name").like("red%")).select(col("p_partkey"))
    val qualified = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(col("l_quantity")).as("q"))
      .filter(col("q") > 50)
      .select(col("l_suppkey")).distinct()
    Tables.supplier(spark, dir)
      .join(broadcast(qualified), col("s_suppkey") === col("l_suppkey"), "left_semi")
      .join(broadcast(Tables.nation(spark, dir).select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_name"), col("s_acctbal"), col("n_name"))
      .orderBy(col("s_name"))
  }

  val excessSuppliersSql: String =
    """SELECT s_name, s_acctbal, n_name
      |FROM supplier
      |JOIN nation ON n_nationkey = s_nationkey
      |WHERE s_suppkey IN (
      |  SELECT l_suppkey FROM lineitem
      |  JOIN part ON p_partkey = l_partkey
      |  WHERE p_name LIKE 'red%'
      |    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  GROUP BY l_suppkey, l_partkey
      |  HAVING sum(l_quantity) > 50)
      |ORDER BY s_name""".stripMargin

  /** D22 — TPCH Q21 shape (suppliers who kept orders waiting):
    * EXISTS + NOT-EXISTS self-joins, expressed as left-semi then
    * left-anti on distinct (order, supplier) pairs — all three
    * relations shuffle on orderkey, so the two "joins" co-locate in
    * one exchange lineage. "Late" derives from shipdate vs orderdate
    * (the testdata has no receipt/commit dates).
    */
  def waitingSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(Tables.orders(spark, dir).filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
    val pairs = base.select(col("l_orderkey"), col("l_suppkey")).distinct()
    val late = base
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .select(col("l_orderkey"), col("l_suppkey")).distinct()
    val others    = pairs.select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk2"))
    val lateOther = late.select(col("l_orderkey").as("ok3"), col("l_suppkey").as("sk3"))
    late
      .join(others, col("l_orderkey") === col("ok2") && col("l_suppkey") =!= col("sk2"), "left_semi")
      .join(lateOther, col("l_orderkey") === col("ok3") && col("l_suppkey") =!= col("sk3"), "left_anti")
      .join(broadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(10)
  }

  val waitingSuppliersSql: String =
    """WITH base AS (
      |  SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
      |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      |  WHERE o_orderstatus = 'F'),
      |pairs AS (SELECT DISTINCT l_orderkey, l_suppkey FROM base),
      |late AS (
      |  SELECT DISTINCT l_orderkey, l_suppkey FROM base
      |  WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY)
      |SELECT s_name, count(*) AS numwait
      |FROM late l1
      |JOIN supplier ON s_suppkey = l1.l_suppkey
      |WHERE EXISTS (SELECT 1 FROM pairs l2
      |  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM late l3
      |  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 10""".stripMargin

  /** D23 — TPCH Q22 shape (global sales opportunity): customers above
    * the positive-balance average of their nation pool with no RECENT
    * orders (every synthetic customer has some order, so the classic
    * no-orders-ever predicate is date-bounded). Balances are exact
    * integer cents and the average compare is cross-multiplied —
    * integer arithmetic, no division at all; the anti-join's right
    * side is the date-pruned orders projection.
    */
  def salesOpportunity(spark: SparkSession, dir: String): DataFrame = {
    val pool = Tables.customer(spark, dir)
      .filter(col("c_nationkey").isin(1, 3, 5, 7, 9))
      .select(col("c_custkey"), col("c_nationkey"),
        round(col("c_acctbal") * 100).cast("long").as("bal_c"))
    val avgp = pool.filter(col("bal_c") > 0)
      .agg(sum(col("bal_c")).as("s"), count(lit(1)).as("n"))
    val recent = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    pool.crossJoin(broadcast(avgp))
      .filter(col("bal_c") * col("n") > col("s"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"),
        (sum(col("bal_c")).cast("double") / 100).as("totacctbal"))
      .orderBy(col("c_nationkey"))
  }

  val salesOpportunitySql: String =
    """WITH pool AS (
      |  SELECT c_custkey, c_nationkey, CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
      |  FROM customer WHERE c_nationkey IN (1, 3, 5, 7, 9)),
      |avgp AS (SELECT CAST(sum(bal_c) AS BIGINT) AS s, count(*) AS n
      |  FROM pool WHERE bal_c > 0)
      |SELECT c_nationkey, count(*) AS numcust,
      |  CAST(sum(bal_c) AS DOUBLE) / 100 AS totacctbal
      |FROM pool CROSS JOIN avgp
      |WHERE bal_c * n > s
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |    WHERE o.o_custkey = pool.c_custkey
      |      AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
      |GROUP BY c_nationkey
      |ORDER BY c_nationkey""".stripMargin
}

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
    val o = Tables.orders(spark, dir)
      .filter(year(col("o_orderdate")) === 1996)
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
      .filter(year(col("l_shipdate")) >= fromYear && year(col("l_shipdate")) < untilYear)
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
}

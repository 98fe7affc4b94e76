package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Every oracle-checked (★) operator has a `queries` entry AND an
  * `oracleSql` entry with identical output column names; rows-only (☆)
  * operators have a `queries` entry plus a ScalaTest spec.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Tpch.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // D — general batch analytics
    "q_pricing_summary"      -> (Tpch.pricingSummary(_, _)),
    "q_revenue_filter"       -> (Tpch.revenueFilter(_, _)),
    "q_shipping_priority"    -> (Tpch.shippingPriority(_, _)),
    "q_local_supplier_volume" -> (Tpch.localSupplierVolume(_, _)),
    "q_small_qty_revenue"    -> (Tpch.smallQtyRevenue(_, _)),
    "q_running_revenue"      -> (Tpch.runningRevenue(_, _)),
  )

  /** DuckDB-runnable oracle SQL, same column names as the Spark plan. */
  def oracleSql: Map[String, String] = Map(
    "q_pricing_summary"      -> Tpch.pricingSummarySql,
    "q_revenue_filter"       -> Tpch.revenueFilterSql,
    "q_shipping_priority"    -> Tpch.shippingPrioritySql,
    "q_local_supplier_volume" -> Tpch.localSupplierVolumeSql,
    "q_small_qty_revenue"    -> Tpch.smallQtyRevenueSql,
    "q_running_revenue"      -> Tpch.runningRevenueSql,
  )
}

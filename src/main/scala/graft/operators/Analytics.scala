package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytical queries over the fact tables — the reporting workload a
  * sync target serves once data lands. Money is per-row-rounded to
  * bigint cents before summing (exact integer arithmetic thereafter,
  * hash-stable across engines); revenue = price·(1-discount).
  */
object Analytics {
  private val revCents =
    round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
      .cast("long")

  /** Pricing summary per (returnflag, linestatus) — full fact scan,
    * map-side-combined aggregation, one shuffle on a 6-value key. */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .select(
        col("l_returnflag"), col("l_linestatus"),
        round(col("l_quantity") * 100).cast("long").as("qty_c"),
        round(col("l_extendedprice") * 100).cast("long").as("price_c"),
        revCents.as("rev_c"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("qty_c").as("sum_qty_c"),
        sum("price_c").as("sum_price_c"),
        sum("rev_c").as("sum_rev_c"),
        count(lit(1)).as("n"))

  /** Top-10 orders by revenue for one market segment: broadcast-filtered
    * customer dim, fact joins shuffled on the order key, windowed top-k
    * after the aggregate (WindowGroupLimit prunes map-side). */
  def topRevenueOrders(customer: DataFrame, orders: DataFrame,
                       lineitem: DataFrame, segment: String = "BUILDING",
                       k: Int = 10): DataFrame = {
    val cust = customer.where(col("c_mktsegment") === segment)
      .select("c_custkey")
    val w = Window.orderBy(col("revenue_c").desc, col("o_orderkey"))
    orders.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey"), revCents.as("rev_c"))
      .groupBy("o_orderkey")
      .agg(sum("rev_c").as("revenue_c"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  /** Revenue per supplier nation: two broadcast dims, one fact shuffle. */
  def supplierNationRevenue(supplier: DataFrame, nation: DataFrame,
                            lineitem: DataFrame): DataFrame =
    lineitem
      .select(col("l_suppkey"), revCents.as("rev_c"))
      .join(broadcast(supplier.select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation.select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(sum("rev_c").as("revenue_c"), count(lit(1)).as("n_items"))
}

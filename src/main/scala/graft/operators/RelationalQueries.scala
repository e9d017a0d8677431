package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables.t

/** Relational operator surface mapped from SURVEY.md §2 (A1-A3, J1/J8, W1/W5,
  * S10, SO4) expressed over the driver test tables. Each query has a DuckDB
  * oracle in [[oracleSql]] with identical column names/types.
  *
  * Scale notes (100 TB design): every aggregation here is a partial-agg
  * (map-side combine) shape; joins against `nation`/`region` are broadcast;
  * windows partition by high-cardinality keys (user_id) so no single-task
  * sort. Doubles are rounded at the output boundary only.
  */
object RelationalQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1: pricing summary (TPC-H Q1 flavor) — partial+final agg, tiny result.
    "q_pricing_summary" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // W5: top-k by aggregate with deterministic tiebreak.
    "q_top_customers" -> ((s, d) => {
      val orders = t(s, d, "orders")
      val cust = t(s, d, "customer")
      orders.join(cust, orders("o_custkey") === cust("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(round(sum(col("o_totalprice")), 2).as("revenue"),
             count(lit(1)).as("n_orders"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(10)
    }),

    // A3: pivot-style matrix via conditional aggregation (grouping by nation,
    // one column per market segment — stable column set, no dynamic pivot).
    "q_market_pivot" -> ((s, d) => {
      val cust = t(s, d, "customer")
      val nation = t(s, d, "nation")
      cust.join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          count(when(col("c_mktsegment") === "BUILDING", 1)).as("n_building"),
          count(when(col("c_mktsegment") === "AUTOMOBILE", 1)).as("n_automobile"),
          count(when(col("c_mktsegment") === "MACHINERY", 1)).as("n_machinery"),
          count(when(col("c_mktsegment") === "HOUSEHOLD", 1)).as("n_household"),
          count(when(col("c_mktsegment") === "FURNITURE", 1)).as("n_furniture"))
        .orderBy(col("n_name"))
    }),

    // J1 (FN side): left-anti join — customers with no finished ('F') order.
    "q_customers_no_orders" -> ((s, d) => {
      val cust = t(s, d, "customer")
      val orders = t(s, d, "orders")
        .filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      cust.join(orders, cust("c_custkey") === orders("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // J8/SO4: broadcast dimension joins + semi-join flavor.
    "q_suppliers_by_region" -> ((s, d) => {
      val supp = t(s, d, "supplier")
      val nation = t(s, d, "nation")
      val region = t(s, d, "region")
      supp.join(broadcast(nation), supp("s_nationkey") === nation("n_nationkey"))
        .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_suppliers"),
             round(sum(col("s_acctbal")), 2).as("total_acctbal"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // W1: lag window over per-user event streams (partition by high-card key).
    "q_event_deltas" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, d, "events")
        .withColumn("prev_value", lag(col("value"), 1).over(w))
        .filter(col("prev_value").isNotNull)
        .select(col("event_id"), col("user_id"),
                round(col("value") - col("prev_value"), 4).as("delta"))
        .orderBy(col("event_id"))
    }),

    // A2: edge-statistics shape — group counts + distincts per type.
    "q_event_stats" -> ((s, d) => {
      t(s, d, "events")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
             countDistinct(col("user_id")).as("n_users"),
             round(sum(col("value")), 2).as("total_value"))
        .orderBy(col("event_type"))
    }),

    // J1: full-join flavor — per-customer order counts including zero.
    "q_orders_per_customer" -> ((s, d) => {
      val cust = t(s, d, "customer")
      val orders = t(s, d, "orders")
      cust.join(orders, cust("c_custkey") === orders("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy(col("c_custkey"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         ROUND(SUM(l_quantity), 2) AS sum_qty,
         ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
         ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
         COUNT(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q_top_customers" ->
      """SELECT c_custkey, c_name, ROUND(SUM(o_totalprice), 2) AS revenue,
         COUNT(*) AS n_orders
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_custkey, c_name
         ORDER BY revenue DESC, c_custkey LIMIT 10""",
    "q_market_pivot" ->
      """SELECT n_name,
         COUNT(*) FILTER (c_mktsegment = 'BUILDING') AS n_building,
         COUNT(*) FILTER (c_mktsegment = 'AUTOMOBILE') AS n_automobile,
         COUNT(*) FILTER (c_mktsegment = 'MACHINERY') AS n_machinery,
         COUNT(*) FILTER (c_mktsegment = 'HOUSEHOLD') AS n_household,
         COUNT(*) FILTER (c_mktsegment = 'FURNITURE') AS n_furniture
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name ORDER BY n_name""",
    "q_customers_no_orders" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
         ORDER BY c_custkey""",
    "q_suppliers_by_region" ->
      """SELECT r_name, n_name, COUNT(*) AS n_suppliers,
         ROUND(SUM(s_acctbal), 2) AS total_acctbal
         FROM supplier JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name ORDER BY r_name, n_name""",
    "q_event_deltas" ->
      """SELECT event_id, user_id, ROUND(value - prev_value, 4) AS delta
         FROM (SELECT event_id, user_id, value,
               LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
               FROM events)
         WHERE prev_value IS NOT NULL ORDER BY event_id""",
    "q_event_stats" ->
      """SELECT event_type, COUNT(*) AS n_events,
         COUNT(DISTINCT user_id) AS n_users,
         ROUND(SUM(value), 2) AS total_value
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q_orders_per_customer" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey ORDER BY c_custkey"""
  )
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.etl.Gold

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query is a pure function (SparkSession, sfDir) => DataFrame with a
  * DuckDB-SQL twin in [[oracleSql]] using identical output column names
  * (the driver sorts columns by name before hashing).
  *
  * Determinism contract shared by all oracle-compared queries: exact
  * aggregates (counts, integer cents, day sums) plus fractional columns
  * derived from them via identical IEEE-754 expressions on both sides —
  * see graft.etl.Gold scaladoc.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Gold.dailySales(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "gold_daily_sales"          -> (Gold.dailySales(_, _)),
    "gold_customer_metrics"     -> (Gold.customerMetrics(_, _)),
    "gold_product_performance"  -> (Gold.productPerformance(_, _)),
    "gold_seller_performance"   -> (Gold.sellerPerformance(_, _)),
    "gold_satisfaction_metrics" -> (Gold.satisfactionMetrics(_, _)),
    "gold_delivery_performance" -> (Gold.deliveryPerformance(_, _)),
  )

  /** DuckDB twins of [[queries]], same column names/aliases both sides. */
  def oracleSql: Map[String, String] = Map(
    "gold_daily_sales" ->
      """WITH g AS (
        |  SELECT strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
        |         count(l.l_orderkey) AS total_items,
        |         CAST(round(sum(l.l_extendedprice) * 100) AS BIGINT)
        |           AS total_sales_cents,
        |         CAST(round(sum(l.l_tax) * 100) AS BIGINT) AS total_tax_cents
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  GROUP BY 1)
        |SELECT order_date, total_items, total_sales_cents, total_tax_cents,
        |       total_sales_cents / 100.0 AS total_sales,
        |       (total_sales_cents / 100.0) / total_items AS avg_price
        |FROM g""".stripMargin,
    "gold_customer_metrics" ->
      """WITH enriched AS (
        |  SELECT c.c_custkey, c.c_mktsegment, l.l_orderkey,
        |         l.l_extendedprice, o.o_orderdate,
        |         strftime(min(o.o_orderdate) OVER (PARTITION BY c.c_custkey),
        |                  '%Y-%m-%d') AS first_purchase_date,
        |         strftime(max(o.o_orderdate) OVER (PARTITION BY c.c_custkey),
        |                  '%Y-%m-%d') AS last_purchase_date
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey),
        |g AS (
        |  SELECT c_custkey, c_mktsegment, first_purchase_date,
        |         last_purchase_date,
        |         count(l_orderkey) AS total_items,
        |         CAST(round(sum(l_extendedprice) * 100) AS BIGINT)
        |           AS total_spent_cents,
        |         CAST(date_diff('day', CAST(min(o_orderdate) AS DATE),
        |                        CAST(max(o_orderdate) AS DATE)) AS BIGINT)
        |           AS customer_lifetime_days
        |  FROM enriched GROUP BY 1, 2, 3, 4)
        |SELECT c_custkey, c_mktsegment, first_purchase_date,
        |       last_purchase_date, total_items, total_spent_cents,
        |       customer_lifetime_days,
        |       total_spent_cents / 100.0 AS total_spent,
        |       (total_spent_cents / 100.0) / total_items AS avg_item_price
        |FROM g""".stripMargin,
    "gold_product_performance" ->
      """WITH g AS (
        |  SELECT p.p_partkey, p.p_brand,
        |         count(l.l_orderkey) AS times_sold,
        |         CAST(round(sum(l.l_extendedprice) * 100) AS BIGINT)
        |           AS total_revenue_cents,
        |         CAST(round(sum(l.l_quantity)) AS BIGINT) AS total_quantity
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  GROUP BY 1, 2)
        |SELECT p_partkey, p_brand, times_sold, total_revenue_cents,
        |       total_quantity,
        |       total_revenue_cents / 100.0 AS total_revenue,
        |       (total_revenue_cents / 100.0) / times_sold AS avg_price
        |FROM g""".stripMargin,
    "gold_seller_performance" ->
      """WITH g AS (
        |  SELECT s.s_suppkey, s.s_nationkey,
        |         count(l.l_orderkey) AS total_items,
        |         CAST(round(sum(l.l_extendedprice) * 100) AS BIGINT)
        |           AS total_sales_cents,
        |         CAST(sum(date_diff('day', CAST(o.o_orderdate AS DATE),
        |                            CAST(l.l_shipdate AS DATE))) AS BIGINT)
        |           AS ship_delay_days_sum
        |  FROM lineitem l
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  GROUP BY 1, 2)
        |SELECT s_suppkey, s_nationkey, total_items, total_sales_cents,
        |       ship_delay_days_sum,
        |       total_sales_cents / 100.0 AS total_sales,
        |       (total_sales_cents / 100.0) / total_items AS avg_sale_price,
        |       CAST(ship_delay_days_sum AS DOUBLE) / total_items
        |         AS avg_shipping_delay_days
        |FROM g""".stripMargin,
    "gold_satisfaction_metrics" ->
      """WITH g AS (
        |  SELECT event_type, strftime(ts, '%Y-%m-%d') AS event_date,
        |         CAST(round(sum(value) * 100) AS BIGINT) AS score_cents_sum,
        |         count(event_id) AS n_events
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, event_date, score_cents_sum, n_events,
        |       (score_cents_sum / 100.0) / n_events AS avg_score
        |FROM g""".stripMargin,
    "gold_delivery_performance" ->
      """WITH g AS (
        |  SELECT o.o_orderstatus,
        |         count(l.l_orderkey) AS total_items,
        |         CAST(sum(date_diff('day', CAST(o.o_orderdate AS DATE),
        |                            CAST(l.l_shipdate AS DATE))) AS BIGINT)
        |           AS delay_days_sum,
        |         CAST(sum(CASE WHEN date_diff('day',
        |                             CAST(o.o_orderdate AS DATE),
        |                             CAST(l.l_shipdate AS DATE)) > 30
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS delayed_items
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  GROUP BY 1)
        |SELECT o_orderstatus, total_items, delay_days_sum, delayed_items,
        |       CAST(delay_days_sum AS DOUBLE) / total_items
        |         AS avg_delivery_delay
        |FROM g""".stripMargin,
  )
}

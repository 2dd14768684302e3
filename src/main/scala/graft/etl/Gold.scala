package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Gold-zone analytics — the reference's six aggregation queries
  * (reference `include/scripts/to_gold.py:57-132`, SURVEY.md §2.4 A1-A6)
  * re-keyed to the driver's TPC-H-ish testdata per SURVEY.md §7.2.
  *
  * Semantics preserved from the reference:
  *  - `count(key)` after a fact⋈dim join counts LINE ITEMS (non-null count),
  *    not distinct orders (`to_gold.py:61,75,87,100`).
  *  - customer metrics computes window min/max BEFORE grouping and uses the
  *    formatted results as grouping keys (`to_gold.py:71-73`).
  *  - delivery performance uses a conditional count
  *    `sum(when(delay > threshold, 1).otherwise(0))` (`to_gold.py:130`).
  *
  * == Oracle determinism (SURVEY.md §7.5) ==
  * Money sums are aggregated as exact integer cents
  * (`round(sum(x)*100)::long` — inputs are 2-decimal, double sum error is
  * ~1e-9, so the integer round is exact) and every fractional output is
  * DERIVED from those exact integers with the same IEEE-754 expression on
  * both the Spark and DuckDB sides — bit-identical doubles with no
  * round-half boundary anywhere. Dates are emitted as formatted strings.
  *
  * == Scale design ==
  * Every query is a declarative join+groupBy chain: Catalyst plans partial
  * (map-side) aggregation before the shuffle, and AQE handles runtime
  * broadcast selection and skew splitting. Fact⋈fact joins (lineitem⋈orders)
  * shuffle on the join key — correct at 100 TB since both sides scale with
  * SF; dim sides (supplier, part, customer) are left to AQE's dynamic
  * broadcast decision rather than a hardcoded hint, because "small" is a
  * runtime property at 100 TB, not a compile-time one.
  */
object Gold {

  /** Exact integer cents of a 2-decimal money column's sum. */
  private def centsSum(c: String): Column =
    round(sum(col(c)) * 100).cast("long")

  /** Driver-contract registration (SparkEntry aggregates these). */
  /** Revenue waterfall per return flag: gross → after-discount →
    * after-tax, with the discount/tax deltas — the finance
    * decomposition of TPC-H Q1's derived columns. Every tier is an
    * EXACT scaled integer: gross in cents, and the cross terms
    * `price·disc` / `price·(1−disc)·tax` in e8 (cents × two e2
    * factors), summed as Longs (≤ ~1e13 per row — safe far past 1e5
    * rows per flag per partition sum; final sums are the exact corpus
    * values). The displayed dollar columns divide once per tier.
    */
  def marginWaterfall(li: DataFrame): DataFrame = {
    val priceC = round(col("l_extendedprice") * 100).cast("long")
    val discE2 = round(col("l_discount") * 100).cast("long")
    val taxE2 = round(col("l_tax") * 100).cast("long")
    li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_lines"),
        sum(priceC).as("gross_cents"),
        sum(priceC * discE2).as("disc_e4"),
        sum(priceC * (lit(100L) - discE2) * taxE2).as("tax_e6"))
      .select(col("l_returnflag"), col("n_lines"), col("gross_cents"),
        col("disc_e4"), col("tax_e6"),
        (col("gross_cents").cast("double") / lit(100.0)).as("gross_usd"),
        (col("disc_e4").cast("double") / lit(10000.0)).as("discount_usd"),
        (col("tax_e6").cast("double") / lit(1000000.0)).as("tax_usd"))
  }

  /** Percent-of-parent revenue shares: nation within region, region
    * within total — the drill-down share columns every BI hierarchy
    * report carries. The fact table shuffles ONCE (to nation grain);
    * both share windows ride the nation-level aggregate (25 rows at
    * any corpus size — dimension-bounded), and each share is a single
    * division of exact cents.
    */
  def regionNationShares(ord: DataFrame, cust: DataFrame,
      nat: DataFrame): DataFrame = {
    val rev = ord.join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy("c_nationkey")
      .agg(centsSum("o_totalprice").as("rev_cents"))
      .join(graft.plans.Layout.advisedBroadcast(
        nat.select(col("n_nationkey"), col("n_name"), col("n_regionkey")),
        fixed = 16L, strCols = Seq("n_name")),
        col("c_nationkey") === col("n_nationkey"))
    val wRegion = Window.partitionBy("n_regionkey")
    val wAll = Window.partitionBy()
    rev
      .withColumn("region_cents", sum("rev_cents").over(wRegion))
      .withColumn("total_cents", sum("rev_cents").over(wAll))
      .select(col("n_regionkey"), col("n_name"), col("rev_cents"),
        col("region_cents"),
        (col("rev_cents").cast("double") / col("region_cents"))
          .as("share_of_region"),
        (col("region_cents").cast("double") / col("total_cents"))
          .as("region_share_of_total"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "gold_margin_waterfall" -> ((s, d) =>
      marginWaterfall(Tables.lineitem(s, d))),
    "gold_region_shares" -> ((s, d) => regionNationShares(
      Tables.orders(s, d), Tables.customer(s, d), Tables.nation(s, d))),
    "gold_daily_sales"          -> (dailySales(_, _)),
    "gold_customer_metrics"     -> (customerMetrics(_, _)),
    "gold_product_performance"  -> (productPerformance(_, _)),
    "gold_seller_performance"   -> (sellerPerformance(_, _)),
    "gold_satisfaction_metrics" -> (satisfactionMetrics(_, _)),
    "gold_delivery_performance" -> (deliveryPerformance(_, _)),
  )

  /** A1 `daily_sales` (`to_gold.py:57-65`): items⋈orders, per order date. */
  def dailySales(spark: SparkSession, sfDir: String): DataFrame =
    dailySalesStage(Tables.lineitem(spark, sfDir), Tables.orders(spark, sfDir))

  def dailySalesStage(li: DataFrame, ord: DataFrame): DataFrame = {
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .withColumn("order_date", date_format(col("o_orderdate"), "yyyy-MM-dd"))
      .groupBy("order_date")
      .agg(
        count("l_orderkey").as("total_items"),
        centsSum("l_extendedprice").as("total_sales_cents"),
        centsSum("l_tax").as("total_tax_cents"))
      .withColumn("total_sales", col("total_sales_cents") / 100.0)
      .withColumn("avg_price",
        (col("total_sales_cents") / 100.0) / col("total_items"))
  }

  /** A2 `customer_metrics` (`to_gold.py:69-80`): window min/max purchase
    * date per customer BEFORE the groupBy, formatted strings as group keys.
    */
  def customerMetrics(spark: SparkSession, sfDir: String): DataFrame =
    customerMetricsStage(Tables.lineitem(spark, sfDir),
      Tables.orders(spark, sfDir), Tables.customer(spark, sfDir))

  def customerMetricsStage(li: DataFrame, ord: DataFrame,
      cust: DataFrame): DataFrame = {
    // The reference computes first/last purchase with a window over
    // c_custkey and then groups by (custkey, segment, first, last) — but
    // all three extra keys are FUNCTIONS of c_custkey within the joined
    // stream (one segment per customer; the window's min/max are
    // per-custkey constants), so the groups are exactly the per-customer
    // groups and the window is a plain aggregate in disguise. Computing
    // min/max INSIDE the aggregation removes the Window plus its full
    // Sort of the joined fact stream, and — the part that matters at
    // 100 TB — restores map-side partial aggregation: the exchange now
    // carries one partial row per customer per map partition instead of
    // every line item (guide §2.3 "aggregate before you shuffle";
    // before/after plans in plans/r19/gold_customer_metrics_*.txt:
    // Exchange+Sort+Window+2×HashAggregate → partial HashAggregate+
    // Exchange+final HashAggregate). Output is bit-identical: same
    // date_format over the same min/max, same column order —
    // oracle-verified (hash_match) after the rewrite.
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .groupBy("c_custkey", "c_mktsegment")
      .agg(
        count("l_orderkey").as("total_items"),
        centsSum("l_extendedprice").as("total_spent_cents"),
        min("o_orderdate").as("__first"),
        max("o_orderdate").as("__last"))
      .select(col("c_custkey"), col("c_mktsegment"),
        date_format(col("__first"), "yyyy-MM-dd").as("first_purchase_date"),
        date_format(col("__last"), "yyyy-MM-dd").as("last_purchase_date"),
        col("total_items"), col("total_spent_cents"),
        datediff(col("__last"), col("__first")).cast("long")
          .as("customer_lifetime_days"))
      .withColumn("total_spent", col("total_spent_cents") / 100.0)
      .withColumn("avg_item_price",
        (col("total_spent_cents") / 100.0) / col("total_items"))
  }

  /** A3 `product_performance` (`to_gold.py:84-91`): items⋈products. */
  def productPerformance(spark: SparkSession, sfDir: String): DataFrame =
    productPerformanceStage(Tables.lineitem(spark, sfDir),
      Tables.part(spark, sfDir))

  def productPerformanceStage(li: DataFrame, pt: DataFrame): DataFrame = {
    li.join(pt, li("l_partkey") === pt("p_partkey"))
      .groupBy("p_partkey", "p_brand")
      .agg(
        count("l_orderkey").as("times_sold"),
        centsSum("l_extendedprice").as("total_revenue_cents"),
        // l_quantity is integral-valued double; sum is exact in both engines
        round(sum("l_quantity")).cast("long").as("total_quantity"))
      .withColumn("total_revenue", col("total_revenue_cents") / 100.0)
      .withColumn("avg_price",
        (col("total_revenue_cents") / 100.0) / col("times_sold"))
  }

  /** A4 `seller_performance` (`to_gold.py:94-105`): items⋈sellers⋈orders
    * with the reference's `avg(datediff(ship, purchase))` aggregate,
    * derived here from an exact integer day-sum.
    */
  def sellerPerformance(spark: SparkSession, sfDir: String): DataFrame =
    sellerPerformanceStage(Tables.lineitem(spark, sfDir),
      Tables.supplier(spark, sfDir), Tables.orders(spark, sfDir))

  def sellerPerformanceStage(li: DataFrame, sup: DataFrame,
      ord: DataFrame): DataFrame = {
    li.join(sup, li("l_suppkey") === sup("s_suppkey"))
      .join(ord, li("l_orderkey") === ord("o_orderkey"))
      .withColumn("ship_delay_days",
        datediff(col("l_shipdate"), col("o_orderdate")))
      .groupBy("s_suppkey", "s_nationkey")
      .agg(
        count("l_orderkey").as("total_items"),
        centsSum("l_extendedprice").as("total_sales_cents"),
        sum("ship_delay_days").cast("long").as("ship_delay_days_sum"))
      .withColumn("total_sales", col("total_sales_cents") / 100.0)
      .withColumn("avg_sale_price",
        (col("total_sales_cents") / 100.0) / col("total_items"))
      .withColumn("avg_shipping_delay_days",
        col("ship_delay_days_sum").cast("double") / col("total_items"))
  }

  /** A5 `satisfaction_metrics` (`to_gold.py:109-115`): events play the
    * reviews role (SURVEY.md §7.2) — score→value, review_date→ts.
    */
  def satisfactionMetrics(spark: SparkSession, sfDir: String): DataFrame =
    satisfactionMetricsStage(Tables.events(spark, sfDir))

  def satisfactionMetricsStage(ev: DataFrame): DataFrame = {
    ev.withColumn("event_date", date_format(col("ts"), "yyyy-MM-dd"))
      .groupBy("event_type", "event_date")
      .agg(
        centsSum("value").as("score_cents_sum"),
        count("event_id").as("n_events"))
      .withColumn("avg_score",
        (col("score_cents_sum") / 100.0) / col("n_events"))
  }

  /** A6 `delivery_performance` (`to_gold.py:119-131`): per order status,
    * avg delay + conditional count of delayed lines
    * (`sum(when(delay > threshold, 1).otherwise(0))`, `to_gold.py:130`).
    * Delay re-keyed as datediff(l_shipdate, o_orderdate); threshold 30d so
    * the conditional discriminates on this data.
    */
  def deliveryPerformance(spark: SparkSession, sfDir: String): DataFrame =
    deliveryPerformanceStage(Tables.lineitem(spark, sfDir),
      Tables.orders(spark, sfDir))

  def deliveryPerformanceStage(li: DataFrame, ord: DataFrame): DataFrame = {
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .withColumn("delivery_delay",
        datediff(col("l_shipdate"), col("o_orderdate")))
      .groupBy("o_orderstatus")
      .agg(
        count("l_orderkey").as("total_items"),
        sum("delivery_delay").cast("long").as("delay_days_sum"),
        sum(when(col("delivery_delay") > 30, 1).otherwise(0)).cast("long")
          .as("delayed_items"))
      .withColumn("avg_delivery_delay",
        col("delay_days_sum").cast("double") / col("total_items"))
  }

  /** DuckDB twins of [[queries]] — same column names/aliases both sides. */
  def oracleSql: Map[String, String] = Map(
    "gold_region_shares" ->
      """WITH rev AS (
        |  SELECT c.c_nationkey,
        |         CAST(round(sum(o.o_totalprice) * 100) AS BIGINT)
        |           AS rev_cents
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1),
        |j AS (
        |  SELECT n.n_regionkey, n.n_name, r.rev_cents
        |  FROM rev r JOIN nation n ON r.c_nationkey = n.n_nationkey),
        |w AS (
        |  SELECT *,
        |         CAST(sum(rev_cents) OVER (PARTITION BY n_regionkey)
        |              AS BIGINT) AS region_cents,
        |         CAST(sum(rev_cents) OVER () AS BIGINT) AS total_cents
        |  FROM j)
        |SELECT n_regionkey, n_name, rev_cents, region_cents,
        |       CAST(rev_cents AS DOUBLE) / region_cents AS share_of_region,
        |       CAST(region_cents AS DOUBLE) / total_cents
        |         AS region_share_of_total
        |FROM w""".stripMargin,
    "gold_margin_waterfall" ->
      """WITH b AS (
        |  SELECT l_returnflag,
        |         CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
        |         CAST(round(l_discount * 100) AS BIGINT) AS disc_e2,
        |         CAST(round(l_tax * 100) AS BIGINT) AS tax_e2
        |  FROM lineitem),
        |g AS (
        |  SELECT l_returnflag, count(*) AS n_lines,
        |         CAST(sum(price_c) AS BIGINT) AS gross_cents,
        |         CAST(sum(price_c * disc_e2) AS BIGINT) AS disc_e4,
        |         CAST(sum(price_c * (100 - disc_e2) * tax_e2) AS BIGINT)
        |           AS tax_e6
        |  FROM b GROUP BY 1)
        |SELECT l_returnflag, n_lines, gross_cents, disc_e4, tax_e6,
        |       CAST(gross_cents AS DOUBLE) / CAST(100.0 AS DOUBLE)
        |         AS gross_usd,
        |       CAST(disc_e4 AS DOUBLE) / CAST(10000.0 AS DOUBLE)
        |         AS discount_usd,
        |       CAST(tax_e6 AS DOUBLE) / CAST(1000000.0 AS DOUBLE)
        |         AS tax_usd
        |FROM g""".stripMargin,
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

package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Relational-surface completeness beyond the reference's own operators
  * (SURVEY.md §2.5/2.6 notes them absent; a user switching engines still
  * expects them): ranking windows, global top-k, set operations, distinct
  * and approximate-distinct aggregation, rollup, pivot.
  *
  * == Scale design ==
  * - Per-group top-k is a window `row_number` over a hash-partitioned sort
  *   — one shuffle on the group key.
  * - Global top-k uses `orderBy(...).limit(k)`, which Spark plans as
  *   `TakeOrderedAndProject` — per-partition heaps + driver merge of k
  *   rows, NOT a global sort; the only plan that survives 100 TB.
  * - Set ops compile to hash aggregates/joins; distinct counts shuffle
  *   once per distinct column (Spark expands); `approx_count_distinct` is
  *   the single-shuffle HLL path for when exactness isn't required.
  */
object Relational {

  private def centsSum(c: String) = round(sum(col(c)) * 100).cast("long")

  /** Top-5 customers by spend within each market segment (ranking window
    * over an aggregate).
    */
  def topCustomersPerSegment(li: DataFrame, ord: DataFrame,
      cust: DataFrame): DataFrame = {
    val spend = li
      .join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .groupBy("c_custkey", "c_mktsegment")
      .agg(centsSum("l_extendedprice").as("spent_cents"))
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("spent_cents").desc, col("c_custkey"))
    spend
      .withColumn("rn", row_number().over(w))
      .withColumn("rnk", rank().over(w))
      .filter(col("rn") <= 5)
      .select("c_mktsegment", "rn", "rnk", "c_custkey", "spent_cents")
  }

  /** Same top-5-per-segment result through the custom heap operator
    * (graft.plans.TopKPerGroup: LogicalPlan + Strategy + SparkPlan,
    * O(n log k) per group, no sort) — oracle-checked against the same
    * DuckDB SQL minus the rank columns, proving the custom physical
    * operator is semantics-identical to the window formulation.
    */
  def topCustomersPerSegmentHeap(li: DataFrame, ord: DataFrame,
      cust: DataFrame): DataFrame = {
    val spend = li
      .join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .groupBy("c_custkey", "c_mktsegment")
      .agg(centsSum("l_extendedprice").as("spent_cents"))
    graft.plans.TopKPerGroup(spend, Seq("c_mktsegment"),
      Seq("spent_cents" -> true, "c_custkey" -> false), k = 5)
      .select("c_mktsegment", "c_custkey", "spent_cents")
  }

  /** Global top-100 orders by price — planned as TakeOrderedAndProject. */
  def topOrders(ord: DataFrame): DataFrame =
    ord.select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)

  /** Set operations: (BUILDING ∪ high-balance) ∖ low-nation customers. */
  def customerSetOps(cust: DataFrame): DataFrame = {
    val building = cust.filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val highBal = cust.filter(col("c_acctbal") > 5000).select("c_custkey")
    val lowNation = cust.filter(col("c_nationkey") < 5).select("c_custkey")
    building.union(highBal).distinct().except(lowNation)
  }

  /** Distinct aggregation per return flag. */
  def distinctAggs(li: DataFrame): DataFrame =
    li.groupBy("l_returnflag")
      .agg(
        countDistinct("l_orderkey").as("n_orders"),
        countDistinct("l_partkey").as("n_parts"),
        count(lit(1)).as("n_lines"))

  /** Exact vs approximate (HLL++) distinct counts — HLL sketches are
    * engine-specific, so this is rows-only; RelationalSpec bounds the
    * relative error.
    */
  def approxDistinct(li: DataFrame): DataFrame =
    li.groupBy("l_returnflag")
      .agg(
        countDistinct("l_orderkey").as("exact_orders"),
        approx_count_distinct(col("l_orderkey"), rsd = 0.02)
          .as("approx_orders"))

  /** Rollup over (returnflag, linestatus): subtotal + grand-total rows. */
  def rollupSales(li: DataFrame): DataFrame =
    li.rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n_lines"),
        centsSum("l_extendedprice").as("sales_cents"))

  /** Cube over (returnflag, linestatus): all 2^2 grouping combinations. */
  def cubeSales(li: DataFrame): DataFrame =
    li.cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n_lines"),
        centsSum("l_extendedprice").as("sales_cents"))

  /** Unpivot (melt): customer per-metric long format from wide columns. */
  def unpivotCustomer(cust: DataFrame): DataFrame =
    cust.select(col("c_custkey"),
        col("c_acctbal").as("acctbal"),
        col("c_nationkey").cast("double").as("nationkey"))
      .unpivot(
        ids = Array(col("c_custkey")),
        values = Array(col("acctbal"), col("nationkey")),
        variableColumnName = "metric",
        valueColumnName = "value")

  /** Pivot linestatus into columns (fixed pivot values: F, O). */
  def pivotSales(li: DataFrame): DataFrame =
    li.groupBy("l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(centsSum("l_extendedprice"))
      .withColumnRenamed("F", "cents_f")
      .withColumnRenamed("O", "cents_o")

  /** TPC-H-Q1-shape pricing summary: flag/status rollup of quantities and
    * discounted revenue. Revenue terms `price*(1-disc)` are exact 4-dp
    * decimals, so the e4-integer sum is exact (the cents pattern at 1e4).
    */
  def pricingSummary(li: DataFrame): DataFrame =
    li.groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity")).cast("long").as("sum_qty"),
        centsSum("l_extendedprice").as("base_cents"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          * 10000).cast("long").as("revenue_e4"),
        count(lit(1)).as("n_lines"))
      .withColumn("revenue", col("revenue_e4") / 10000.0)
      .withColumn("avg_qty",
        col("sum_qty").cast("double") / col("n_lines"))

  /** The SQL entry path: identical pricing summary expressed through
    * `spark.sql` over registered temp views — proves the engine surface
    * is reachable from SQL text, not only the DataFrame DSL.
    */
  def pricingSummarySql(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("lineitem_v")
    spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |       CAST(round(sum(l_quantity)) AS BIGINT) AS sum_qty,
        |       CAST(round(sum(l_extendedprice) * 100) AS BIGINT)
        |         AS base_cents,
        |       CAST(round(sum(l_extendedprice * (1.0 - l_discount)) * 10000)
        |            AS BIGINT) AS revenue_e4,
        |       count(*) AS n_lines
        |FROM lineitem_v
        |GROUP BY l_returnflag, l_linestatus""".stripMargin)
      .withColumn("revenue", col("revenue_e4") / 10000.0)
      .withColumn("avg_qty",
        col("sum_qty").cast("double") / col("n_lines"))
  }

  /** Driver-contract registration (SparkEntry aggregates these). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> ((s, d) => pricingSummary(Tables.lineitem(s, d))),
    "q1_pricing_sql"     -> (pricingSummarySql(_, _)),
    "rank_top_customers" -> ((s, d) => topCustomersPerSegment(
      Tables.lineitem(s, d), Tables.orders(s, d), Tables.customer(s, d))),
    "rank_top_customers_heap" -> ((s, d) => topCustomersPerSegmentHeap(
      Tables.lineitem(s, d), Tables.orders(s, d), Tables.customer(s, d))),
    "rank_top_orders"    -> ((s, d) => topOrders(Tables.orders(s, d))),
    "set_customer_ops"   -> ((s, d) => customerSetOps(Tables.customer(s, d))),
    "agg_distinct"       -> ((s, d) => distinctAggs(Tables.lineitem(s, d))),
    "agg_approx_distinct" -> ((s, d) => approxDistinct(Tables.lineitem(s, d))),
    "agg_rollup"         -> ((s, d) => rollupSales(Tables.lineitem(s, d))),
    "agg_cube"           -> ((s, d) => cubeSales(Tables.lineitem(s, d))),
    "agg_unpivot"        -> ((s, d) =>
      unpivotCustomer(Tables.customer(s, d))),
    "agg_pivot"          -> ((s, d) => pivotSales(Tables.lineitem(s, d))),
  )

  private val q1Oracle =
    """WITH g AS (
      |  SELECT l_returnflag, l_linestatus,
      |         CAST(round(sum(l_quantity)) AS BIGINT) AS sum_qty,
      |         CAST(round(sum(l_extendedprice) * 100) AS BIGINT)
      |           AS base_cents,
      |         CAST(round(sum(l_extendedprice * (1.0 - l_discount)) * 10000)
      |              AS BIGINT) AS revenue_e4,
      |         count(*) AS n_lines
      |  FROM lineitem GROUP BY 1, 2)
      |SELECT l_returnflag, l_linestatus, sum_qty, base_cents, revenue_e4,
      |       n_lines,
      |       revenue_e4 / 10000.0 AS revenue,
      |       CAST(sum_qty AS DOUBLE) / n_lines AS avg_qty
      |FROM g""".stripMargin

  /** DuckDB twins (approx_distinct is rows-only — HLL differs by engine). */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" -> q1Oracle,
    "q1_pricing_sql"     -> q1Oracle,
    "rank_top_customers_heap" ->
      """WITH spend AS (
        |  SELECT c.c_custkey, c.c_mktsegment,
        |         CAST(round(sum(l.l_extendedprice) * 100) AS BIGINT)
        |           AS spent_cents
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1, 2)
        |SELECT c_mktsegment, c_custkey, spent_cents FROM (
        |  SELECT *, row_number() OVER (PARTITION BY c_mktsegment
        |            ORDER BY spent_cents DESC, c_custkey) AS rn
        |  FROM spend)
        |WHERE rn <= 5""".stripMargin,
    "rank_top_customers" ->
      """WITH spend AS (
        |  SELECT c.c_custkey, c.c_mktsegment,
        |         CAST(round(sum(l.l_extendedprice) * 100) AS BIGINT)
        |           AS spent_cents
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1, 2),
        |ranked AS (
        |  SELECT *,
        |         row_number() OVER (PARTITION BY c_mktsegment
        |           ORDER BY spent_cents DESC, c_custkey) AS rn,
        |         rank() OVER (PARTITION BY c_mktsegment
        |           ORDER BY spent_cents DESC, c_custkey) AS rnk
        |  FROM spend)
        |SELECT c_mktsegment, rn, rnk, c_custkey, spent_cents
        |FROM ranked WHERE rn <= 5""".stripMargin,
    "rank_top_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "set_customer_ops" ->
      """(SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        | UNION
        | SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
        |EXCEPT
        |SELECT c_custkey FROM customer WHERE c_nationkey < 5""".stripMargin,
    "agg_distinct" ->
      """SELECT l_returnflag,
        |       count(DISTINCT l_orderkey) AS n_orders,
        |       count(DISTINCT l_partkey) AS n_parts,
        |       count(*) AS n_lines
        |FROM lineitem GROUP BY 1""".stripMargin,
    "agg_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_lines,
        |       CAST(round(sum(l_extendedprice) * 100) AS BIGINT)
        |         AS sales_cents
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)"""
        .stripMargin,
    "agg_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_lines,
        |       CAST(round(sum(l_extendedprice) * 100) AS BIGINT)
        |         AS sales_cents
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)"""
        .stripMargin,
    "agg_unpivot" ->
      """SELECT c_custkey, metric, value FROM (
        |  SELECT c_custkey, c_acctbal AS acctbal,
        |         CAST(c_nationkey AS DOUBLE) AS nationkey
        |  FROM customer)
        |UNPIVOT (value FOR metric IN (acctbal, nationkey))"""
        .stripMargin,
    "agg_pivot" ->
      """SELECT l_returnflag,
        |       CAST(round(sum(CASE WHEN l_linestatus = 'F'
        |                           THEN l_extendedprice END) * 100)
        |            AS BIGINT) AS cents_f,
        |       CAST(round(sum(CASE WHEN l_linestatus = 'O'
        |                           THEN l_extendedprice END) * 100)
        |            AS BIGINT) AS cents_o
        |FROM lineitem GROUP BY 1""".stripMargin,
  )
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Incremental aggregate maintenance: keep a materialized aggregate fresh
  * by merging the aggregate of a NEW batch into the stored partial
  * aggregates, instead of re-scanning history — the batch form of what
  * Structured Streaming's stateful aggregation does, and the only shape
  * that works when history is 100 TB and the daily delta is 100 GB.
  *
  * The trick is keeping every stored measure MERGEABLE: counts and
  * integer-cent sums merge by addition (sum of partials = total, exactly,
  * per the repo's per-value-cents pattern — round each value to cents
  * BEFORE summing, so partial sums are integers and merging never
  * re-rounds). Averages are derived at read time from the merged exact
  * parts, never stored.
  *
  * == Scale design ==
  * `merge` shuffles only the two (already aggregated) partial tables —
  * group-cardinality-sized, not input-sized. The driver query proves the
  * invariant the operator exists for: partial(old) ⊕ partial(delta) is
  * hash-identical to the full recompute (the DuckDB oracle aggregates
  * everything from scratch).
  */
object IncrementalAgg {

  /** Mergeable partial daily-sales aggregate of one batch of orders. */
  def dailySalesPartial(orders: DataFrame): DataFrame =
    orders
      .select(to_date(col("o_orderdate")).as("day"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy("day")
      .agg(count(lit(1)).as("n_orders"), sum("cents").as("sales_cents"))

  /** Merge stored partials with a new batch's partials (same schema:
    * key `day`, additive measures). Outer union covers days present in
    * only one side.
    */
  def merge(stored: DataFrame, delta: DataFrame): DataFrame =
    stored.unionByName(delta)
      .groupBy("day")
      .agg(sum("n_orders").as("n_orders"),
        sum("sales_cents").as("sales_cents"))

  /** Driver query: history/delta split at a cutoff date, maintained
    * incrementally; emits the merged aggregate plus the derived average
    * (exact-int division). The oracle recomputes from scratch — merged
    * partials must be indistinguishable from a full aggregation.
    */
  def incrementalDailySales(orders: DataFrame,
      cutoff: String = "1996-01-01"): DataFrame = {
    val history = orders.filter(col("o_orderdate") < lit(cutoff))
    val delta = orders.filter(col("o_orderdate") >= lit(cutoff))
    merge(dailySalesPartial(history), dailySalesPartial(delta))
      .select(col("day").cast("string").as("day"),
        col("n_orders"), col("sales_cents"),
        (col("sales_cents").cast("double") / col("n_orders"))
          .as("avg_order_cents"))
  }

  /** Driver-contract registration (SparkEntry aggregates these). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_incremental" -> ((s, d) =>
      incrementalDailySales(Tables.orders(s, d))),
  )

  /** DuckDB twin: the full recompute — incremental maintenance must be
    * invisible in the result.
    */
  def oracleSql: Map[String, String] = Map(
    "agg_incremental" ->
      """SELECT CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS day,
        |       count(*) AS n_orders,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |            AS BIGINT) AS sales_cents,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |            AS DOUBLE) / count(*) AS avg_order_cents
        |FROM orders
        |GROUP BY 1""".stripMargin,
  )
}

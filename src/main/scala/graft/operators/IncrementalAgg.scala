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

  /** Incremental JOIN-view maintenance — the delta-join identity
    * `(A ∪ ΔA) ⋈ (B ∪ ΔB) = A⋈B ∪ ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB` — for a
    * customer⋈orders view: history joins history ONCE (at 100 TB that
    * join is the thing you must never re-run), and each refresh adds the
    * three delta terms, whose left/right sides are delta-sized or
    * history-sized-but-delta-probed. The maintained view is then rolled
    * up per (mktsegment, orderstatus) — and must be indistinguishable
    * from joining everything from scratch (the oracle does exactly
    * that).
    *
    * Deltas are carved deterministically (key mod [[DeltaMod]]) so the
    * oracle can replay the same split; in production the deltas are the
    * day's arriving rows.
    *
    * Scale shape: four joins whose inputs are each either pre-shuffled
    * history (co-partitioned once) or small deltas (AQE broadcasts
    * them); the rollup partial-aggregates each term map-side. No term
    * rescans history against history.
    */
  def incrementalJoin(customer: DataFrame, orders: DataFrame): DataFrame = {
    val custKeyed = customer.select(col("c_custkey"), col("c_mktsegment"))
    val ordKeyed = orders.select(col("o_custkey"), col("o_orderstatus"),
      round(col("o_totalprice") * 100).cast("long").as("cents"))
    val (histC, deltaC) = (
      custKeyed.filter(pmod(col("c_custkey"), lit(DeltaMod)) =!= 0L),
      custKeyed.filter(pmod(col("c_custkey"), lit(DeltaMod)) === 0L))
    val (histO, deltaO) = (
      ordKeyed.filter(pmod(col("o_custkey"), lit(DeltaMod)) =!= 17L),
      ordKeyed.filter(pmod(col("o_custkey"), lit(DeltaMod)) === 17L))
    def term(c: DataFrame, o: DataFrame) =
      c.join(o, c("c_custkey") === o("o_custkey"))
        .select(col("c_mktsegment"), col("o_orderstatus"), col("cents"))
    term(histC, histO)
      .unionByName(term(deltaC, histO))
      .unionByName(term(histC, deltaO))
      .unionByName(term(deltaC, deltaO))
      .groupBy("c_mktsegment", "o_orderstatus")
      .agg(count(lit(1)).as("n_orders"), sum("cents").as("sales_cents"))
  }

  /** Modulus carving the deterministic history/delta split. */
  val DeltaMod = 50L

  /** Driver-contract registration (SparkEntry aggregates these). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_incremental" -> ((s, d) =>
      incrementalDailySales(Tables.orders(s, d))),
    "incremental_join" -> ((s, d) =>
      incrementalJoin(Tables.customer(s, d), Tables.orders(s, d))),
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
    // the full recompute: one join from scratch — the four delta terms
    // must be invisible in the result
    "incremental_join" ->
      """SELECT c.c_mktsegment, o.o_orderstatus,
        |       count(*) AS n_orders,
        |       CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
        |            AS BIGINT) AS sales_cents
        |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        |GROUP BY 1, 2""".stripMargin,
  )
}

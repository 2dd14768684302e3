package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Binned (bucketed) range join — the scalable formulation of the
  * time-proximity join `|l.ts − r.ts| ≤ tolerance`.
  *
  * A naive range predicate plans as BroadcastNestedLoopJoin: O(|L|·|R|)
  * comparisons, which dies at 100 TB. Binning floors both sides' epochs
  * to `tolerance`-sized buckets; a qualifying pair's bins differ by at
  * most 1, so candidates come from an EQUI-join on (bin ± 1) — three
  * shuffle-hash joins of O(|L|+|R|) rows each — and the exact predicate
  * filters the candidates. Same result, hash-join cost.
  */
object RangeJoin {

  /** Pairs (event, order-of-same-customer) whose timestamps lie within
    * `toleranceDays` of each other, via bin+filter. Output carries the
    * exact day delta.
    */
  def eventsNearOrders(ev: DataFrame, ord: DataFrame,
      toleranceDays: Int): DataFrame = {
    val tolSecs = toleranceDays.toLong * 86400
    val l = ev.select(col("event_id"), col("user_id"),
        col("ts").cast("timestamp").as("lts"))
      .withColumn("lbin", floor(unix_timestamp(col("lts")) / tolSecs))
    val r = ord.select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate").cast("timestamp").as("rts"))
      .withColumn("rbin", floor(unix_timestamp(col("rts")) / tolSecs))
    val shifted = l.select(col("*"),
      explode(array(col("lbin") - 1, col("lbin"), col("lbin") + 1))
        .as("probe_bin"))
    shifted
      .join(r, col("probe_bin") === col("rbin") &&
        col("user_id") === col("o_custkey"))
      .filter(abs(unix_timestamp(col("lts")) - unix_timestamp(col("rts")))
        <= tolSecs)
      .select(col("event_id"), col("o_orderkey"),
        datediff(col("lts"), col("rts")).cast("long").as("delta_days"))
    // no dedup needed: rbin is a single value, so each (event, order)
    // pair matches exactly ONE of the three probe bins — a distinct here
    // would shuffle the full result for nothing (and the oracle's naive
    // join has no DISTINCT either)
  }

  /** Driver-contract registration. Tolerance chosen so the events
    * (2024) and orders (1995-2000) ranges actually overlap: the join is
    * keyed per customer with a ±10000-day window.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "range_join_events_orders" -> ((s, d) =>
      eventsNearOrders(Tables.events(s, d), Tables.orders(s, d), 10000)),
  )

  /** DuckDB twin: the naive non-equi range join (same semantics). */
  def oracleSql: Map[String, String] = Map(
    "range_join_events_orders" ->
      """SELECT e.event_id, o.o_orderkey,
        |       CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
        |                      CAST(e.ts AS DATE)) AS BIGINT) AS delta_days
        |FROM events e JOIN orders o
        |  ON e.user_id = o.o_custkey
        | AND abs(CAST(floor(epoch(e.ts)) AS BIGINT)
        |         - CAST(floor(epoch(o.o_orderdate)) AS BIGINT))
        |     <= 10000 * 86400
        |""".stripMargin,
  )
}

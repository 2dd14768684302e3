package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Key-based snapshot diff: given two versions of a table, classify every
  * key as `added` / `removed` / `changed` (with the list of columns that
  * differ) — the audit primitive behind incremental publishing, CDC
  * backfill validation, and "what did yesterday's load change" debugging.
  * Rows equal on every compared column are dropped from the output, so the
  * result is the (small) delta, not the (huge) table.
  *
  * == Scale design ==
  * One full-outer shuffle join on the key — the minimal data movement any
  * exact diff needs — with null-safe (`<=>`) column comparison so NULL →
  * value and value → NULL transitions count as changes. The classification
  * and changed-column list are pure projection (codegen) on top of the
  * join; nothing is collected, and the unchanged majority is filtered
  * before any downstream materialization. At 100 TB both sides bucket or
  * pre-partition by the key and the join co-locates without a shuffle.
  */
object SnapshotDiff {

  /** Diff `b` (new) against `a` (old) on `keys`, comparing `compareCols`.
    * Output: key columns, `diff_status` ∈ added|removed|changed, and
    * `changed_cols` (comma-joined names, empty for added/removed).
    */
  def diff(a: DataFrame, b: DataFrame, keys: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    val an = a.select((keys ++ compareCols).map(col): _*).alias("a")
    val bn = b.select((keys ++ compareCols).map(col): _*).alias("b")
    val joinCond = keys.map(k => col(s"a.$k") <=> col(s"b.$k"))
      .reduce(_ && _)
    val inA = keys.map(k => col(s"a.$k").isNotNull).reduce(_ || _)
    val inB = keys.map(k => col(s"b.$k").isNotNull).reduce(_ || _)
    val changed: Column = compareCols
      .map(c => !(col(s"a.$c") <=> col(s"b.$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    val changedCols = concat_ws(",", compareCols.map(c =>
      when(!(col(s"a.$c") <=> col(s"b.$c")), lit(c))): _*)
    an.join(bn, joinCond, "full_outer")
      .select(
        keys.map(k => coalesce(col(s"a.$k"), col(s"b.$k")).as(k)) ++ Seq(
          when(!inA, lit("added"))
            .when(!inB, lit("removed"))
            .when(changed, lit("changed")).as("diff_status"),
          when(inA && inB, changedCols).otherwise(lit("")).as("changed_cols")): _*)
      .filter(col("diff_status").isNotNull)
  }

  /** Driver query: two deterministic snapshots derived from orders —
    * version A drops keys ≡3 (mod 10) (so they show as `added` in B),
    * version B drops keys ≡2 (mod 7) (`removed`) and bumps o_totalprice
    * on keys ≡0 (mod 5) (`changed`) — and the diff classifies every key.
    */
  def diffOrders(orders: DataFrame): DataFrame = {
    val base = orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
    val a = base.filter(pmod(col("o_orderkey"), lit(10)) =!= 3)
    val b = base.filter(pmod(col("o_orderkey"), lit(7)) =!= 2)
      .withColumn("o_totalprice",
        when(pmod(col("o_orderkey"), lit(5)) === 0,
          col("o_totalprice") + 1.0).otherwise(col("o_totalprice")))
    diff(a, b, Seq("o_orderkey"), Seq("o_orderstatus", "o_totalprice"))
  }

  /** Driver-contract registration (SparkEntry aggregates these). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "diff_snapshots" -> ((s, d) => diffOrders(Tables.orders(s, d))),
  )

  /** DuckDB twin: same snapshot derivation, same classification. */
  def oracleSql: Map[String, String] = Map(
    "diff_snapshots" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |a AS (SELECT * FROM base WHERE o_orderkey % 10 <> 3),
        |b AS (SELECT o_orderkey, o_orderstatus,
        |             CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0
        |                  ELSE o_totalprice END AS o_totalprice
        |      FROM base WHERE o_orderkey % 7 <> 2)
        |SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
        |       CASE WHEN a.o_orderkey IS NULL THEN 'added'
        |            WHEN b.o_orderkey IS NULL THEN 'removed'
        |            WHEN a.o_orderstatus IS DISTINCT FROM b.o_orderstatus
        |              OR a.o_totalprice IS DISTINCT FROM b.o_totalprice
        |              THEN 'changed' END AS diff_status,
        |       CASE WHEN a.o_orderkey IS NOT NULL AND b.o_orderkey IS NOT NULL
        |            THEN concat_ws(',',
        |              CASE WHEN a.o_orderstatus IS DISTINCT FROM
        |                        b.o_orderstatus THEN 'o_orderstatus' END,
        |              CASE WHEN a.o_totalprice IS DISTINCT FROM
        |                        b.o_totalprice THEN 'o_totalprice' END)
        |            ELSE '' END AS changed_cols
        |FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
        |WHERE CASE WHEN a.o_orderkey IS NULL THEN 'added'
        |           WHEN b.o_orderkey IS NULL THEN 'removed'
        |           WHEN a.o_orderstatus IS DISTINCT FROM b.o_orderstatus
        |             OR a.o_totalprice IS DISTINCT FROM b.o_totalprice
        |             THEN 'changed' END IS NOT NULL""".stripMargin,
  )
}

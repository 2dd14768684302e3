package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** As-of (point-in-time) join — an operator Spark lacks natively,
  * composed from built-ins per the preference ladder (compose > custom
  * plan): for every left row, attach the LATEST right row whose timestamp
  * is ≤ the left timestamp, per key.
  *
  * Implementation: tag both sides, union, and take
  * `last(right_payload, ignoreNulls) OVER (PARTITION BY key ORDER BY ts,
  * side ROWS UNBOUNDED PRECEDING)` — right rows sort before left rows at
  * equal timestamps, so the match is inclusive ("at or before"), matching
  * DuckDB's `ASOF JOIN` semantics used as the oracle.
  *
  * == Scale design ==
  * One shuffle on the key + per-partition sort — the same cost class as a
  * sort-merge join, with no range explosion (a naive `l.ts >= r.ts`
  * theta-join is O(|L|·|R|) per key). At 100 TB both sides shuffle on the
  * natural key; AQE splits skewed keys.
  *
  * Right side must be unique per (key, ts) — pre-aggregate ties away,
  * otherwise the "latest" row is ambiguous in ANY engine.
  */
object AsOfJoin {

  /** Composed as-of join. `rightPayload` are the right columns to carry;
    * left columns pass through unchanged.
    */
  def asOf(left: DataFrame, leftKey: Column, leftTs: Column,
      right: DataFrame, rightKey: Column, rightTs: Column,
      rightPayload: Seq[String]): DataFrame = {
    val rStruct = struct(rightPayload.map(right(_)): _*)
    val rSchema = {
      // resolve payload struct type from the right side's schema
      val fields = rightPayload.map(n => right.schema(n))
      org.apache.spark.sql.types.StructType(fields)
    }
    // keys keep their native type — a cast would null out string/UUID keys
    // and silently collapse them into one window partition
    val l2 = left.select(
      leftKey.as("__k"), leftTs.cast("timestamp").as("__t"),
      lit(1).as("__side"), struct(left.columns.map(left(_)): _*).as("__l"),
      lit(null).cast(rSchema).as("__r"))
    val r2 = right.select(
      rightKey.as("__k"), rightTs.cast("timestamp").as("__t"),
      lit(0).as("__side"), lit(null).cast(l2.schema("__l").dataType).as("__l"),
      rStruct.as("__r"))
    require(l2.schema("__k").dataType == r2.schema("__k").dataType,
      s"as-of join key types must match: left is " +
        s"${l2.schema("__k").dataType.sql}, right is " +
        s"${r2.schema("__k").dataType.sql} — cast one side explicitly")
    val w = Window.partitionBy("__k")
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l2.unionByName(r2)
      .withColumn("__match", last("__r", ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__l.*") +:
        rightPayload.map(n => col(s"__match.$n").as(n)): _*)
  }

  /** Query: each event joined to the user's latest order at event time.
    * Order ties per (custkey, date) are pre-aggregated to max(o_orderkey)
    * so the match is well-defined (see scaladoc).
    */
  def latestOrderAsOf(ev: DataFrame, ord: DataFrame): DataFrame = {
    val r = ord.groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max("o_orderkey").as("o_orderkey"))
    asOf(
      ev.select(col("event_id"), col("user_id"), col("ts")),
      col("user_id"), col("ts"),
      r, r("o_custkey"), r("o_orderdate"),
      Seq("o_orderkey", "o_orderdate"))
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("event_ts"),
        col("o_orderkey").as("asof_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("asof_orderdate"))
      .drop("ts")
  }

  /** NEAREST-neighbor as-of join — both directions in ONE sort: for
    * every left row, the right row minimizing |t_left − t_right| per
    * key, ties to the backward (at-or-before) match. The same
    * tag-union shape as [[asOf]], with TWO frames over one window
    * ordering: `last(right, ignoreNulls)` over the preceding frame
    * (backward candidate) and `first(right, ignoreNulls)` over the
    * following frame (forward candidate) — Spark evaluates both in a
    * single WindowExec pass, so nearest costs the same one
    * shuffle+sort as backward-only. Deltas compare in exact
    * MICROSECONDS (`unix_micros`), so the choice is integer-exact.
    * Rows with no candidate on either side are dropped (inner
    * semantics, like the oracle's join).
    */
  def asOfNearest(left: DataFrame, leftKey: Column, leftTs: Column,
      right: DataFrame, rightKey: Column, rightTs: Column,
      rightPayload: Seq[String]): DataFrame = {
    val rStruct = struct(
      rightTs.cast("timestamp").as("__rts") +:
        rightPayload.map(right(_)): _*)
    val rSchema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("__rts",
        org.apache.spark.sql.types.TimestampType) +:
        rightPayload.map(n => right.schema(n)))
    val l2 = left.select(
      leftKey.as("__k"), leftTs.cast("timestamp").as("__t"),
      lit(1).as("__side"), struct(left.columns.map(left(_)): _*).as("__l"),
      lit(null).cast(rSchema).as("__r"))
    val r2 = right.select(
      rightKey.as("__k"), rightTs.cast("timestamp").as("__t"),
      lit(0).as("__side"), lit(null).cast(l2.schema("__l").dataType).as("__l"),
      rStruct.as("__r"))
    val ord = Window.partitionBy("__k").orderBy(col("__t"), col("__side"))
    val wb = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val chosen = l2.unionByName(r2)
      .withColumn("__back", last("__r", ignoreNulls = true).over(wb))
      .withColumn("__fwd", first("__r", ignoreNulls = true).over(wf))
      .filter(col("__side") === 1)
      .withColumn("__db",
        unix_micros(col("__t")) - unix_micros(col("__back.__rts")))
      .withColumn("__df",
        unix_micros(col("__fwd.__rts")) - unix_micros(col("__t")))
      .withColumn("__m",
        when(col("__back").isNull, col("__fwd"))
          .when(col("__fwd").isNull, col("__back"))
          .when(col("__df") < col("__db"), col("__fwd"))
          .otherwise(col("__back")))
      .filter(col("__m").isNotNull)
    chosen.select(col("__l.*") +:
      (rightPayload.map(n => col(s"__m.$n").as(n)) :+
        abs(unix_micros(col("__t")) - unix_micros(col("__m.__rts")))
          .as("delta_us")): _*)
  }

  /** Query: each event joined to the user's NEAREST order in time (tie →
    * the earlier order); same (custkey, date) tie pre-aggregation as
    * [[latestOrderAsOf]].
    */
  def nearestOrderAsOf(ev: DataFrame, ord: DataFrame): DataFrame = {
    val r = ord.groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max("o_orderkey").as("o_orderkey"))
    asOfNearest(
      ev.select(col("event_id"), col("user_id"), col("ts")),
      col("user_id"), col("ts"),
      r, r("o_custkey"), r("o_orderdate"),
      Seq("o_orderkey", "o_orderdate"))
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("event_ts"),
        col("o_orderkey").as("near_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("near_orderdate"),
        col("delta_us"))
  }

  /** Driver-contract registration (SparkEntry aggregates these). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "asof_latest_order" -> ((s, d) =>
      latestOrderAsOf(Tables.events(s, d), Tables.orders(s, d))),
    "asof_nearest_order" -> ((s, d) =>
      nearestOrderAsOf(Tables.events(s, d), Tables.orders(s, d))),
  )

  /** DuckDB twin — native ASOF LEFT JOIN as the oracle. */
  def oracleSql: Map[String, String] = Map(
    "asof_latest_order" ->
      """WITH r AS (
        |  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
        |  FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id,
        |       strftime(e.ts, '%Y-%m-%d %H:%M:%S.%f') AS event_ts,
        |       r.o_orderkey AS asof_orderkey,
        |       strftime(r.o_orderdate, '%Y-%m-%d') AS asof_orderdate
        |FROM events e ASOF LEFT JOIN r
        |  ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate"""
        .stripMargin,
    "asof_nearest_order" ->
      """WITH r AS (
        |  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
        |  FROM orders GROUP BY 1, 2),
        |cand AS (
        |  SELECT e.event_id, e.user_id, e.ts,
        |         r.o_orderkey, r.o_orderdate,
        |         abs(epoch_us(e.ts) -
        |             epoch_us(CAST(r.o_orderdate AS TIMESTAMP)))
        |           AS delta_us,
        |         CASE WHEN CAST(r.o_orderdate AS TIMESTAMP) <= e.ts
        |              THEN 0 ELSE 1 END AS dir
        |  FROM events e JOIN r ON e.user_id = r.o_custkey),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_id
        |            ORDER BY delta_us, dir) AS rn
        |  FROM cand)
        |SELECT event_id, user_id,
        |       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS event_ts,
        |       o_orderkey AS near_orderkey,
        |       strftime(o_orderdate, '%Y-%m-%d') AS near_orderdate,
        |       delta_us
        |FROM ranked WHERE rn = 1""".stripMargin,
  )
}

package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, MapType, StringType, StructField, StructType}
import graft.Tables

/** Scalar-function surface beyond the reference's own list (SURVEY.md §2.8
  * notes the reference touches only to_timestamp/to_date/date_format/
  * datediff + basic string ops): calendar arithmetic and JSON/map
  * extraction, both staples of a user-facing engine.
  *
  * Everything here is a narrow projection — no shuffle, whole-stage
  * codegen'd end to end — so it scales linearly with input bytes.
  *
  * == Oracle parity notes ==
  * - Spark `dayofweek` is 1=Sunday, DuckDB `dayofweek` is 0=Sunday: the
  *   query emits the 0-based convention on both sides.
  * - `add_months` clamps to month end in both engines (2026-01-31 + 1 →
  *   2026-02-28), verified on DuckDB 1.x.
  * - `weekofyear` is ISO-8601 in both engines.
  * - JSON values are extracted twice — through the string path
  *   (`get_json_object`) and the typed path (`from_json` to MapType /
  *   StructType) — and both are emitted, proving the two APIs agree.
  */
object ScalarSurface {

  /** Calendar-arithmetic surface over order dates: truncation, offset
    * with end-of-month clamping, calendar fields, epoch seconds.
    */
  def orderDateParts(ord: DataFrame): DataFrame =
    ord.select(
      col("o_orderkey"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
      date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd")
        .as("month_start"),
      date_format(add_months(col("o_orderdate"), 3), "yyyy-MM-dd")
        .as("plus3m"),
      date_format(last_day(col("o_orderdate")), "yyyy-MM-dd")
        .as("month_end"),
      quarter(col("o_orderdate")).cast("long").as("qtr"),
      (dayofweek(col("o_orderdate")) - 1).cast("long").as("dow0"),
      dayofyear(col("o_orderdate")).cast("long").as("doy"),
      weekofyear(col("o_orderdate")).cast("long").as("iso_week"),
      (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
        .cast("long").as("month_index"),
      unix_timestamp(col("o_orderdate")).as("epoch_s"))

  private val propsMap = MapType(StringType, LongType)
  private val propsStruct = StructType(Seq(StructField("k", LongType)))

  /** JSON/map extraction over `events.props` — the same value pulled
    * through three APIs (string-path `get_json_object`, typed
    * `from_json` to a map, typed `from_json` to a struct) plus map
    * introspection; all four columns must agree row-by-row, and the
    * oracle recomputes them from DuckDB's JSON functions.
    */
  def eventsJsonProps(ev: DataFrame): DataFrame =
    ev.select(
        col("event_id"), col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k_json"),
        element_at(from_json(col("props"), propsMap), "k").as("k_map"),
        from_json(col("props"), propsStruct).getField("k").as("k_struct"),
        size(map_keys(from_json(col("props"), propsMap))).cast("long")
          .as("n_keys"))
      .withColumn("k_bucket", pmod(col("k_json"), lit(10)))

  /** The same extraction through Spark 4's VARIANT type — `parse_json`
    * into the shredding-ready semi-structured representation,
    * `variant_get` with a typed path out. At 100 TB variant columns beat
    * re-parsing JSON strings per query (parse once at ingest, shred into
    * parquet); the values must agree exactly with the string-path
    * extraction, which is what the DuckDB oracle checks.
    */
  def eventsVariantProps(ev: DataFrame): DataFrame =
    ev.select(
      col("event_id"),
      variant_get(parse_json(col("props")), "$.k", "long").as("k_variant"))
      .withColumn("k_bucket", pmod(col("k_variant"), lit(10)))

  /** Driver-contract registration (SparkEntry aggregates these). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "date_parts"   -> ((s, d) => orderDateParts(Tables.orders(s, d))),
    "json_props"   -> ((s, d) => eventsJsonProps(Tables.events(s, d))),
    "json_variant" -> ((s, d) => eventsVariantProps(Tables.events(s, d))),
  )

  /** DuckDB twins. */
  def oracleSql: Map[String, String] = Map(
    "date_parts" ->
      """SELECT o_orderkey,
        |       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        |       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d')
        |         AS month_start,
        |       strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d')
        |         AS plus3m,
        |       strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
        |       CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
        |       CAST(dayofweek(o_orderdate) AS BIGINT) AS dow0,
        |       CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
        |       CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
        |       CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
        |         AS month_index,
        |       CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
        |FROM orders""".stripMargin,
    "json_variant" ->
      """SELECT event_id,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT)
        |         AS k_variant,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) % 10
        |         AS k_bucket
        |FROM events""".stripMargin,
    "json_props" ->
      """SELECT event_id, event_type,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_json,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_map,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_struct,
        |       CAST(len(json_keys(props)) AS BIGINT) AS n_keys,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) % 10
        |         AS k_bucket
        |FROM events""".stripMargin,
  )
}

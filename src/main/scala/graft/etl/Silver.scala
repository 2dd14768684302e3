package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Silver-zone cleansing — the reference's data-quality operators
  * (reference `include/scripts/to_silver.py:47-102`, SURVEY.md §2.2/2.7)
  * as composable DataFrame => DataFrame stages, re-keyed to the driver
  * testdata (SURVEY.md §7.2).
  *
  * Operators exercised: full-row dedup D1 (`to_silver.py:53`), key dedup D2
  * (`to_silver.py:60,84,91,101` — made deterministic via `row_number` over a
  * total order instead of `dropDuplicates(keys)`'s arbitrary survivor,
  * SURVEY.md §5), null fill D3 (`to_silver.py:54,85,102`), drop-any-null D4
  * (`to_silver.py:61`), comparison filters P2 (`to_silver.py:72-73`),
  * decimal cast P5 (`to_silver.py:70-71`), string normalization
  * lower/upper/trim (`to_silver.py:62-63,92-93`), left join + coalesce
  * J1/P4 (`to_silver.py:81-83`), timestamp parse/format P1
  * (`to_silver.py:48-52`).
  *
  * Oracle determinism: timestamps are emitted as fixed-width formatted
  * strings (`yyyy-MM-dd HH:mm:ss` ↔ strftime) and decimals as their
  * canonical string form — both engines print these identically, while raw
  * timestamp/decimal columns differ in tz-awareness/python type across the
  * parquet/DuckDB fetch paths.
  *
  * Scale design: dedup-by-key is a single hash shuffle on the key (window
  * `row_number` + filter — Spark plans one Exchange + sort per partition);
  * full-row dedup is an aggregate over all columns with map-side partial
  * combine. The nation dim join is `broadcast()` (≤25 rows at any SF).
  */
object Silver {

  /** D2 deterministic key dedup: keep the first row per key under a total
    * order — the oracle-safe replacement for `dropDuplicates(keys)`.
    */
  def dedupByKey(df: DataFrame, key: String, order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  private def ts2str(c: Column): Column =
    date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** Orders cleansing (`to_silver.py:47-54`): timestamp normalize, full-row
    * dedup (D1), status fill (D3).
    */
  def orders(spark: SparkSession, sfDir: String): DataFrame =
    ordersStage(Tables.orders(spark, sfDir))

  def ordersStage(df: DataFrame): DataFrame =
    df.dropDuplicates()
      .na.fill(Map("o_orderstatus" -> "pending"))
      .select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderpriority"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        ts2str(col("o_orderdate")).as("order_purchase_ts"))

  /** Customer cleansing (`to_silver.py:59-63`): drop-any-null (D4), key
    * dedup (D2), lower/upper+trim string normalization.
    */
  def customer(spark: SparkSession, sfDir: String): DataFrame =
    customerStage(Tables.customer(spark, sfDir))

  def customerStage(raw: DataFrame): DataFrame = {
    val base = raw.na.drop()
    dedupByKey(base, "c_custkey",
      Seq(col("c_name"), col("c_nationkey"), col("c_acctbal"),
        col("c_mktsegment")))
      .select(
        col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
        upper(trim(col("c_name"))).as("c_name"),
        lower(trim(col("c_mktsegment"))).as("c_mktsegment"))
  }

  /** Line-item cleansing (`to_silver.py:68-73`): Decimal(12,2) money casts
    * (P5), positivity filters (P2). Decimals emitted as canonical strings
    * for cross-engine comparison.
    */
  def lineitem(spark: SparkSession, sfDir: String): DataFrame =
    lineitemStage(Tables.lineitem(spark, sfDir))

  def lineitemStage(df: DataFrame): DataFrame =
    df.withColumn("price_dec",
        col("l_extendedprice").cast(DecimalType(12, 2)))
      .withColumn("tax_dec", col("l_tax").cast(DecimalType(12, 2)))
      .filter(col("l_extendedprice") > 0 && col("l_tax") >= 0 &&
        col("l_quantity") > 0)
      .select(
        col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_linenumber"), col("l_quantity"),
        col("price_dec").cast("string").as("price"),
        col("tax_dec").cast("string").as("tax"),
        col("l_returnflag"), col("l_linestatus"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date"))

  /** Quarantine (dead-letter) side-output of the lineitem cleansing: the
    * rows [[lineitemStage]] DROPS, each tagged with every rule it
    * violated — the audit table a production medallion pipeline writes
    * next to silver so dropped data is explainable, not vanished. NULL in
    * a rule column counts as a violation (mirrored with `coalesce` on
    * both engines), so silver + rejects partition the input exactly:
    * SilverSpec pins `|silver| + |rejects| == |input|`. The driver
    * testdata is all-clean (0 rejects at every SF) — the oracle still
    * proves cross-engine expression parity on the empty result.
    */
  def lineitemRejects(spark: SparkSession, sfDir: String): DataFrame =
    lineitemRejectsStage(Tables.lineitem(spark, sfDir))

  def lineitemRejectsStage(df: DataFrame): DataFrame = {
    def ok(c: Column): Column = coalesce(c, lit(false))
    df.withColumn("reasons", concat_ws(";",
        when(!ok(col("l_extendedprice") > 0), lit("nonpositive_price")),
        when(!ok(col("l_tax") >= 0), lit("negative_tax")),
        when(!ok(col("l_quantity") > 0), lit("nonpositive_qty"))))
      .filter(col("reasons") =!= "")
      .select(col("l_orderkey"), col("l_linenumber"), col("reasons"))
  }

  /** Product cleansing (`to_silver.py:78-85`): left join to a category dim
    * (J1) + coalesce fallback (P4) + key dedup (D2). part⋈nation plays the
    * products⋈category_translation role (SURVEY.md §7.2); p_size only
    * matches nationkeys 0-24, so unmatched rows exercise the null path.
    * The nation side broadcasts via the exact-bytes advisor hook.
    */
  def part(spark: SparkSession, sfDir: String): DataFrame =
    partStage(Tables.part(spark, sfDir), Tables.nation(spark, sfDir))

  def partStage(pt: DataFrame, nation: DataFrame): DataFrame = {
    // advisor-gated (r16 verdict #3): nation is 25 rows at any SF so the
    // hook always says broadcast today, but the exact-bytes check (not a
    // hardcoded hint) is what keeps that true if the dim ever grows —
    // over threshold it degrades to a shuffle join instead of OOMing
    val nat = graft.plans.Layout.advisedBroadcast(
      nation.select(col("n_nationkey"), col("n_name")),
      fixed = 8L, strCols = Seq("n_name"))
    dedupByKey(
      pt.join(nat, pt("p_size") === nat("n_nationkey"), "left")
        .withColumn("category", coalesce(col("n_name"), lit("unknown"))),
      "p_partkey",
      // every non-key column participates — a true total order, so the
      // survivor is well-defined even for rows differing only in price
      Seq(col("p_name"), col("p_brand"), col("p_type"), col("p_size"),
        col("p_retailprice")))
      .select(
        col("p_partkey"), col("p_name"), col("p_brand"), col("p_type"),
        col("p_size"), col("p_retailprice"), col("category"))
  }

  /** Supplier cleansing (`to_silver.py:90-93`): key dedup + trim/upper. */
  def supplier(spark: SparkSession, sfDir: String): DataFrame =
    supplierStage(Tables.supplier(spark, sfDir))

  def supplierStage(df: DataFrame): DataFrame =
    dedupByKey(df, "s_suppkey",
      Seq(col("s_name"), col("s_nationkey"), col("s_acctbal")))
      .select(
        col("s_suppkey"), col("s_nationkey"), col("s_acctbal"),
        upper(trim(col("s_name"))).as("s_name"))

  /** Events cleansing (`to_silver.py:98-102` reviews role): key dedup (D2),
    * score fill (D3), timestamp normalize (P1), JSON props extraction
    * (SURVEY.md §7.4 multimodal/map column).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    eventsStage(Tables.events(spark, sfDir))

  def eventsStage(df: DataFrame): DataFrame =
    dedupByKey(
      df.na.fill(Map("value" -> 0.0)),
      "event_id",
      // total order over ALL remaining columns (value is post-fill)
      Seq(col("ts"), col("user_id"), col("event_type"), col("value"),
        col("props")))
      .select(
        col("event_id"), col("user_id"), col("event_type"), col("value"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("event_ts"),
        get_json_object(col("props"), "$.k").cast("int").as("prop_k"))

  /** Driver-contract registration (SparkEntry aggregates these). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "silver_orders"   -> (orders(_, _)),
    "silver_customer" -> (customer(_, _)),
    "silver_lineitem" -> (lineitem(_, _)),
    "silver_part"     -> (part(_, _)),
    "silver_supplier" -> (supplier(_, _)),
    "silver_events"   -> (events(_, _)),
    "silver_lineitem_rejects" -> (lineitemRejects(_, _)),
  )

  /** DuckDB twins of [[queries]] — same column names/aliases both sides. */
  def oracleSql: Map[String, String] = Map(
    "silver_lineitem_rejects" ->
      """SELECT l_orderkey, l_linenumber,
        |       concat_ws(';',
        |         CASE WHEN NOT coalesce(l_extendedprice > 0, false)
        |              THEN 'nonpositive_price' END,
        |         CASE WHEN NOT coalesce(l_tax >= 0, false)
        |              THEN 'negative_tax' END,
        |         CASE WHEN NOT coalesce(l_quantity > 0, false)
        |              THEN 'nonpositive_qty' END) AS reasons
        |FROM lineitem
        |WHERE NOT (coalesce(l_extendedprice > 0, false)
        |           AND coalesce(l_tax >= 0, false)
        |           AND coalesce(l_quantity > 0, false))""".stripMargin,
    "silver_orders" ->
      """SELECT o_orderkey, o_custkey,
        |       coalesce(o_orderstatus, 'pending') AS o_orderstatus,
        |       o_totalprice, o_orderpriority,
        |       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        |       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')
        |         AS order_purchase_ts
        |FROM (SELECT DISTINCT * FROM orders)""".stripMargin,
    "silver_customer" ->
      """SELECT c_custkey, c_nationkey, c_acctbal,
        |       upper(trim(c_name)) AS c_name,
        |       lower(trim(c_mktsegment)) AS c_mktsegment
        |FROM (
        |  SELECT *, row_number() OVER (PARTITION BY c_custkey
        |            ORDER BY c_name, c_nationkey, c_acctbal, c_mktsegment)
        |            AS rn
        |  FROM customer
        |  WHERE c_custkey IS NOT NULL AND c_name IS NOT NULL
        |    AND c_nationkey IS NOT NULL AND c_acctbal IS NOT NULL
        |    AND c_mktsegment IS NOT NULL)
        |WHERE rn = 1""".stripMargin,
    "silver_lineitem" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
        |       CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS VARCHAR)
        |         AS price,
        |       CAST(CAST(l_tax AS DECIMAL(12,2)) AS VARCHAR) AS tax,
        |       l_returnflag, l_linestatus,
        |       strftime(l_shipdate, '%Y-%m-%d') AS ship_date
        |FROM lineitem
        |WHERE l_extendedprice > 0 AND l_tax >= 0 AND l_quantity > 0"""
        .stripMargin,
    "silver_part" ->
      """SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice,
        |       category
        |FROM (
        |  SELECT p.*, coalesce(n.n_name, 'unknown') AS category,
        |         row_number() OVER (PARTITION BY p.p_partkey
        |           ORDER BY p.p_name, p.p_brand, p.p_type, p.p_size,
        |                    p.p_retailprice) AS rn
        |  FROM part p LEFT JOIN nation n ON p.p_size = n.n_nationkey)
        |WHERE rn = 1""".stripMargin,
    "silver_supplier" ->
      """SELECT s_suppkey, s_nationkey, s_acctbal,
        |       upper(trim(s_name)) AS s_name
        |FROM (
        |  SELECT *, row_number() OVER (PARTITION BY s_suppkey
        |            ORDER BY s_name, s_nationkey, s_acctbal) AS rn
        |  FROM supplier)
        |WHERE rn = 1""".stripMargin,
    "silver_events" ->
      """SELECT event_id, user_id, event_type, value, event_ts, prop_k
        |FROM (
        |  SELECT event_id, user_id, event_type,
        |         coalesce(value, 0.0) AS value,
        |         strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS event_ts,
        |         CAST(props->>'$.k' AS INT) AS prop_k,
        |         row_number() OVER (PARTITION BY event_id
        |           ORDER BY ts, user_id, event_type,
        |                    coalesce(value, 0.0), props) AS rn
        |  FROM events)
        |WHERE rn = 1""".stripMargin,
  )
}

package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Ordered-window and scalar-function coverage beyond the reference
  * (SURVEY.md §2.5 notes no ordered windows/frames exist there):
  * running totals with explicit frames, lag/lead, ntile, percent_rank,
  * plus string- and array-function surfaces.
  *
  * Determinism notes: running sums are integer cents (a windowed double
  * sum is association-dependent — DuckDB uses segment trees — so only
  * exact integers are portable); percent_rank divides exact ints with
  * the same IEEE expression in both engines.
  */
object WindowOps {

  /** Per-customer order timeline: running spend, previous/next order
    * gap, spend quartile within the customer's history.
    */
  def customerOrderTimeline(ord: DataFrame): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val framed = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ord
      .withColumn("price_cents",
        round(col("o_totalprice") * 100).cast("long"))
      .withColumn("running_cents", sum("price_cents").over(framed))
      .withColumn("prev_order_days",
        datediff(col("o_orderdate"), lag("o_orderdate", 1).over(w))
          .cast("long"))
      .withColumn("next_order_days",
        datediff(lead("o_orderdate", 1).over(w), col("o_orderdate"))
          .cast("long"))
      .withColumn("spend_quartile", ntile(4).over(
        Window.partitionBy("o_custkey").orderBy(
          col("price_cents"), col("o_orderkey"))).cast("long"))
      .select(
        col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        col("price_cents"), col("running_cents"),
        col("prev_order_days"), col("next_order_days"),
        col("spend_quartile"))
  }

  /** Ranking-function surface: dense_rank / percent_rank / cume_dist /
    * first/last/nth_value over orders ranked by price within priority.
    * percent_rank and cume_dist divide exact integers, so both engines
    * produce bit-identical doubles; the total order (price desc, key)
    * makes RANGE and ROWS frames coincide.
    */
  def orderRankExtras(ord: DataFrame): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val full = w.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    ord
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("drank", dense_rank().over(w).cast("long"))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .withColumn("top_key", first_value(col("o_orderkey")).over(w))
      .withColumn("third_key", nth_value(col("o_orderkey"), 3).over(w))
      .withColumn("bottom_key", last(col("o_orderkey")).over(full))
      .filter(col("rn") <= 100)
      .select("o_orderpriority", "rn", "drank", "pct_rank", "cume",
        "o_orderkey", "top_key", "third_key", "bottom_key")
  }

  /** String-function surface over part names: case, pad, replace,
    * split/elements, position, length.
    */
  def partNameOps(pt: DataFrame): DataFrame =
    pt.select(
      col("p_partkey"),
      upper(col("p_name")).as("name_upper"),
      lpad(col("p_brand"), 12, "_").as("brand_padded"),
      regexp_replace(col("p_name"), "[aeiou]", "*").as("devoweled"),
      split(col("p_name"), " ").getItem(0).as("first_word"),
      length(col("p_name")).cast("long").as("name_len"),
      instr(col("p_name"), "widget").cast("long").as("widget_pos"),
      concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"))

  /** Higher-order array-function surface over embeddings: dimensionality,
    * positive-component count, extremes, L1 via aggregate fold.
    */
  def embeddingArrayStats(emb: DataFrame): DataFrame =
    emb.select(
      col("vec_id"),
      size(col("embedding")).cast("long").as("dim"),
      expr("cast(size(filter(embedding, x -> x > cast(0 as float))) as bigint)")
        .as("n_positive"),
      expr("cast(array_max(embedding) as double)").as("max_comp"),
      expr("cast(array_min(embedding) as double)").as("min_comp"),
      expr("aggregate(embedding, cast(0.0 as double), " +
        "(acc, x) -> acc + abs(cast(x as double)))").as("l1_norm"))

  /** Truncated exponentially-weighted moving average of per-customer
    * spend: EWMA over the last `k` orders with weight (1/2)^j on the
    * j-th most recent order, normalized by the weights present.
    *
    * Determinism: α=1/2 is chosen so every weight (1/2)^j is an EXACT
    * double; `price_cents * (1/2)^j` is an exact multiple of 2^-(k-1)
    * far below 2^53, so numerator/denominator sums are exact in any
    * association and the single final division rounds identically in
    * both engines. (A general-α EWMA multiplies inexact `pow` results
    * whose libm rounding differs across engines — not hash-portable.)
    *
    * Scale shape: one window shuffle on the partition key; the k lag
    * terms all share the same window sort, so the whole expression is
    * a single WindowExec pass with codegen'd arithmetic — no
    * collect_list, no per-row array building.
    */
  def ewmaCustomerSpend(ord: DataFrame, k: Int = 8): DataFrame = {
    require(k >= 1 && k <= 30, s"ewma depth out of range: $k")
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val terms = (0 until k).map { j =>
      val x = if (j == 0) col("price_cents")
              else lag(col("price_cents"), j).over(w)
      val wt = lit(math.pow(0.5, j))
      (when(x.isNotNull, x.cast("double") * wt).otherwise(lit(0.0)),
       when(x.isNotNull, wt).otherwise(lit(0.0)))
    }
    val num = terms.map(_._1).reduce(_ + _)
    val den = terms.map(_._2).reduce(_ + _)
    ord
      .withColumn("price_cents",
        round(col("o_totalprice") * 100).cast("long"))
      .select(
        col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        col("price_cents"), (num / den).as("ewma_cents"))
  }

  /** Driver-contract registration (SparkEntry aggregates these). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "window_customer_timeline" -> ((s, d) =>
      customerOrderTimeline(Tables.orders(s, d))),
    "window_rank_extras" -> ((s, d) =>
      orderRankExtras(Tables.orders(s, d))),
    "string_part_ops" -> ((s, d) => partNameOps(Tables.part(s, d))),
    "window_ewma" -> ((s, d) => ewmaCustomerSpend(Tables.orders(s, d))),
    "array_embedding_stats" -> ((s, d) =>
      embeddingArrayStats(Tables.embeddings(s, d))),
  )

  /** DuckDB twins. */
  def oracleSql: Map[String, String] = Map(
    "window_customer_timeline" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
        |  FROM orders)
        |SELECT o_custkey, o_orderkey,
        |       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        |       price_cents,
        |       CAST(sum(price_cents) OVER (PARTITION BY o_custkey
        |         ORDER BY o_orderdate, o_orderkey
        |         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents,
        |       CAST(date_diff('day',
        |         CAST(lag(o_orderdate) OVER (PARTITION BY o_custkey
        |              ORDER BY o_orderdate, o_orderkey) AS DATE),
        |         CAST(o_orderdate AS DATE)) AS BIGINT) AS prev_order_days,
        |       CAST(date_diff('day', CAST(o_orderdate AS DATE),
        |         CAST(lead(o_orderdate) OVER (PARTITION BY o_custkey
        |              ORDER BY o_orderdate, o_orderkey) AS DATE)) AS BIGINT)
        |         AS next_order_days,
        |       ntile(4) OVER (PARTITION BY o_custkey
        |         ORDER BY price_cents, o_orderkey) AS spend_quartile
        |FROM o""".stripMargin,
    "window_rank_extras" ->
      """SELECT o_orderpriority,
        |       rn, drank, pct_rank, cume, o_orderkey, top_key, third_key,
        |       bottom_key
        |FROM (
        |  SELECT o_orderpriority, o_orderkey,
        |         row_number() OVER w AS rn,
        |         dense_rank() OVER w AS drank,
        |         percent_rank() OVER w AS pct_rank,
        |         cume_dist() OVER w AS cume,
        |         first_value(o_orderkey) OVER w AS top_key,
        |         nth_value(o_orderkey, 3) OVER w AS third_key,
        |         last_value(o_orderkey) OVER (
        |           PARTITION BY o_orderpriority
        |           ORDER BY o_totalprice DESC, o_orderkey
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |           AS bottom_key
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_orderpriority
        |               ORDER BY o_totalprice DESC, o_orderkey))
        |WHERE rn <= 100""".stripMargin,
    "string_part_ops" ->
      """SELECT p_partkey,
        |       upper(p_name) AS name_upper,
        |       lpad(p_brand, 12, '_') AS brand_padded,
        |       regexp_replace(p_name, '[aeiou]', '*', 'g') AS devoweled,
        |       string_split(p_name, ' ')[1] AS first_word,
        |       length(p_name) AS name_len,
        |       CAST(instr(p_name, 'widget') AS BIGINT) AS widget_pos,
        |       concat_ws('|', p_brand, p_type) AS brand_type
        |FROM part""".stripMargin,
    "window_ewma" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
        |  FROM orders),
        |lagged AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate, price_cents,
        |         lag(price_cents, 1) OVER w AS x1,
        |         lag(price_cents, 2) OVER w AS x2,
        |         lag(price_cents, 3) OVER w AS x3,
        |         lag(price_cents, 4) OVER w AS x4,
        |         lag(price_cents, 5) OVER w AS x5,
        |         lag(price_cents, 6) OVER w AS x6,
        |         lag(price_cents, 7) OVER w AS x7
        |  FROM o
        |  WINDOW w AS (PARTITION BY o_custkey
        |               ORDER BY o_orderdate, o_orderkey))
        |SELECT o_custkey, o_orderkey,
        |       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        |       price_cents,
        |       (CAST(price_cents AS DOUBLE)
        |        + COALESCE(CAST(x1 AS DOUBLE), 0) * 0.5
        |        + COALESCE(CAST(x2 AS DOUBLE), 0) * 0.25
        |        + COALESCE(CAST(x3 AS DOUBLE), 0) * 0.125
        |        + COALESCE(CAST(x4 AS DOUBLE), 0) * 0.0625
        |        + COALESCE(CAST(x5 AS DOUBLE), 0) * 0.03125
        |        + COALESCE(CAST(x6 AS DOUBLE), 0) * 0.015625
        |        + COALESCE(CAST(x7 AS DOUBLE), 0) * 0.0078125) /
        |       (1.0
        |        + CASE WHEN x1 IS NULL THEN 0 ELSE 0.5 END
        |        + CASE WHEN x2 IS NULL THEN 0 ELSE 0.25 END
        |        + CASE WHEN x3 IS NULL THEN 0 ELSE 0.125 END
        |        + CASE WHEN x4 IS NULL THEN 0 ELSE 0.0625 END
        |        + CASE WHEN x5 IS NULL THEN 0 ELSE 0.03125 END
        |        + CASE WHEN x6 IS NULL THEN 0 ELSE 0.015625 END
        |        + CASE WHEN x7 IS NULL THEN 0 ELSE 0.0078125 END)
        |         AS ewma_cents
        |FROM lagged""".stripMargin,
    "array_embedding_stats" ->
      """SELECT vec_id,
        |       len(embedding) AS dim,
        |       len(list_filter(embedding, x -> x > 0)) AS n_positive,
        |       CAST(list_max(embedding) AS DOUBLE) AS max_comp,
        |       CAST(list_min(embedding) AS DOUBLE) AS min_comp,
        |       list_sum([abs(CAST(x AS DOUBLE)) for x in embedding])
        |         AS l1_norm
        |FROM embeddings""".stripMargin,
  )
}

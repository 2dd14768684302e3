package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Dataset profiling — the "what is in this table" scan every ingest
  * pipeline runs before trusting data: per-column row/null/distinct
  * counts and min/max, emitted long-format (one row per column).
  *
  * One aggregation job computes ALL columns' stats (a single projection
  * of aggregate expressions — one pass over the data, no shuffle beyond
  * the final single-row aggregate), then the row is unpivoted to
  * long format. Min/max are emitted as canonical strings so the profile
  * has one schema regardless of column types (and stays oracle-exact).
  */
object Quality {

  def profile(df: DataFrame): DataFrame = {
    val cols = df.columns.toSeq
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    } :+ count(lit(1)).as("__rows")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      struct(lit(c).as("column"), col("__rows").as("n_rows"),
        (col("__rows") - col(s"__nn_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_str"), col(s"__mx_$c").as("max_str"))
    }
    wide.select(explode(array(stacked: _*)).as("s")).select(col("s.*"))
  }

  /** Percentile-bound outlier detection: orders outside [p1, p99] of
    * their status group. Bounds travel as e3-scaled integers (the
    * percentile determinism pattern, see Relational.percentiles scaladoc):
    * `cents*10 > hi_e3` compares integers only, so boundary rows resolve
    * identically in every engine — a raw double comparison against the
    * interpolated bound would flip on the last bit. The (tiny) per-group
    * bound table broadcast-joins back to the scan: two passes, no sort of
    * the data itself.
    */
  def outliers(ord: DataFrame): DataFrame = {
    val bounds = ord.groupBy("o_orderstatus")
      .agg(
        round(expr("percentile(o_totalprice, 0.01)") * 1000).cast("long")
          .as("lo_e3"),
        round(expr("percentile(o_totalprice, 0.99)") * 1000).cast("long")
          .as("hi_e3"))
    ord.select(col("o_orderkey"), col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long").as("total_cents"))
      .join(broadcast(bounds), Seq("o_orderstatus"))
      .filter(col("total_cents") * 10 > col("hi_e3") ||
        col("total_cents") * 10 < col("lo_e3"))
      .select(col("o_orderkey"), col("o_orderstatus"), col("total_cents"),
        col("lo_e3"), col("hi_e3"),
        when(col("total_cents") * 10 > col("hi_e3"), "high")
          .otherwise("low").as("side"))
  }

  /** Per-group z-score standardization of `l_quantity` — the feature
    * scaling every ML data-prep pipeline runs, done EXACTLY: per-group
    * (count, Σq, Σq²) are integer aggregates (order-independent), and
    * mean/variance/z are derived from them with the identical IEEE
    * expression on both engines. The subtlety: `sqrt` and `/` are
    * correctly-rounded per IEEE 754 (unlike `pow`/`log`, which are
    * libm-dependent), so z-scores hash-match bit-for-bit. Σq² bounds the
    * exactness domain: quantities ≤ 50 over ≤ 2^40 rows stay < 2^53.
    *
    * Scale shape: one partial-aggregating shuffle to 3 group rows, then
    * a broadcast join back onto the fact scan — the standard
    * stats-then-apply two-pass, no window over the full table.
    */
  def zscoreQuantity(li: DataFrame): DataFrame = {
    val q = col("l_quantity").cast("long")
    val stats = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum(q).as("s"), sum(q * q).as("ss"))
    li.select(col("l_orderkey"), col("l_linenumber").cast("long")
          .as("l_linenumber"), col("l_returnflag"), q.as("quantity"))
      .join(broadcast(stats), Seq("l_returnflag"))
      .withColumn("mean_q", col("s").cast("double") / col("n"))
      .withColumn("sd",
        sqrt((col("n") * col("ss") - col("s") * col("s")).cast("double") /
          (col("n") * col("n")).cast("double")))
      // a zero-variance group has no meaningful z: NULL, explicitly —
      // ANSI mode (Spark 4 default) would otherwise throw DIVIDE_BY_ZERO
      .withColumn("z",
        when(col("sd") > 0,
          (col("quantity").cast("double") - col("mean_q")) / col("sd")))
      .select("l_orderkey", "l_linenumber", "l_returnflag", "quantity",
        "mean_q", "z")
  }

  /** Driver-contract registration. Timestamps are pre-formatted to
    * strings and the double price to integer cents, so every profiled
    * column's min/max stringification is engine-identical.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "feature_zscore" -> ((s, d) => zscoreQuantity(Tables.lineitem(s, d))),
    "quality_profile_orders" -> ((s, d) => profile(
      Tables.orders(s, d)
        .withColumn("o_orderdate",
          date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"))
        .withColumn("o_totalprice_cents",
          round(col("o_totalprice") * 100).cast("long"))
        .drop("o_totalprice"))),
    "quality_outliers" -> ((s, d) => outliers(Tables.orders(s, d))),
  )

  /** DuckDB twin — same long-format stats per column. */
  def oracleSql: Map[String, String] = Map(
    "feature_zscore" ->
      """WITH li AS (
        |  SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |         l_returnflag, CAST(l_quantity AS BIGINT) AS quantity
        |  FROM lineitem),
        |st AS (
        |  SELECT l_returnflag, count(*) AS n,
        |         CAST(sum(quantity) AS BIGINT) AS s,
        |         CAST(sum(quantity * quantity) AS BIGINT) AS ss
        |  FROM li GROUP BY 1)
        |SELECT li.l_orderkey, li.l_linenumber, li.l_returnflag,
        |       li.quantity,
        |       CAST(st.s AS DOUBLE) / st.n AS mean_q,
        |       CASE WHEN sqrt(CAST(st.n * st.ss - st.s * st.s AS DOUBLE) /
        |                      CAST(st.n * st.n AS DOUBLE)) > 0
        |            THEN (CAST(li.quantity AS DOUBLE) -
        |                  CAST(st.s AS DOUBLE) / st.n) /
        |                 sqrt(CAST(st.n * st.ss - st.s * st.s AS DOUBLE) /
        |                      CAST(st.n * st.n AS DOUBLE))
        |       END AS z
        |FROM li JOIN st USING (l_returnflag)""".stripMargin,
    "quality_profile_orders" -> {
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_orderdate", "o_orderpriority", "o_totalprice_cents")
      val selects = cols.map { c =>
        s"""SELECT '$c' AS column, count(*) AS n_rows,
           |       count(*) - count($c) AS n_nulls,
           |       count(DISTINCT $c) AS n_distinct,
           |       CAST(min($c) AS VARCHAR) AS min_str,
           |       CAST(max($c) AS VARCHAR) AS max_str
           |FROM t""".stripMargin
      }
      s"""WITH t AS (
         |  SELECT o_orderkey, o_custkey, o_orderstatus,
         |         strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')
         |           AS o_orderdate,
         |         o_orderpriority,
         |         CAST(round(o_totalprice * 100) AS BIGINT)
         |           AS o_totalprice_cents
         |  FROM orders)
         |${selects.mkString("\nUNION ALL\n")}""".stripMargin
    },
    "quality_outliers" ->
      """WITH b AS (
        |  SELECT o_orderstatus,
        |         CAST(round(quantile_cont(o_totalprice, 0.01) * 1000)
        |              AS BIGINT) AS lo_e3,
        |         CAST(round(quantile_cont(o_totalprice, 0.99) * 1000)
        |              AS BIGINT) AS hi_e3
        |  FROM orders GROUP BY 1)
        |SELECT o.o_orderkey, o.o_orderstatus,
        |       CAST(round(o.o_totalprice * 100) AS BIGINT) AS total_cents,
        |       b.lo_e3, b.hi_e3,
        |       CASE WHEN CAST(round(o.o_totalprice * 100) AS BIGINT) * 10
        |                 > b.hi_e3
        |            THEN 'high' ELSE 'low' END AS side
        |FROM orders o JOIN b USING (o_orderstatus)
        |WHERE CAST(round(o.o_totalprice * 100) AS BIGINT) * 10 > b.hi_e3
        |   OR CAST(round(o.o_totalprice * 100) AS BIGINT) * 10 < b.lo_e3"""
        .stripMargin,
  )
}

package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Declarative data-quality expectations — the reusable form of the
  * validation the reference runs ad hoc after each load (reference
  * `include/scripts/to_silver.py:96-102` counts nulls/dupes inline) and
  * of [[Pipeline]]'s hard gates: each rule yields one summary row
  * `(rule, column, n_bad, pass)`, so a quality run is itself a DataFrame
  * a dashboard or gate consumes.
  *
  * == Scale design ==
  * Rules are grouped by the scan they need: every row-local predicate
  * (not-null, range, domain) FUSES into a single aggregate pass over the
  * table — one scan for any number of such rules, the thing a naive
  * rule-at-a-time runner gets wrong at 100 TB; uniqueness is one
  * groupBy on the key; referential integrity is one left-anti join
  * (broadcast when the parent is a dim). Nothing collects.
  */
object Expectations {

  /** A row-local expectation: `bad` flags a violating row. */
  case class RowRule(rule: String, column: String, bad: Column)

  /** Fused single-scan check of row-local rules: all violation counters
    * ride ONE aggregate over one scan, and the single result row unstacks
    * into per-rule rows with a generator (a `select` per rule from the
    * shared aggregate would re-evaluate the scan per union branch).
    */
  def checkRows(df: DataFrame, rules: Seq[RowRule]): DataFrame = {
    require(rules.nonEmpty, "no rules given")
    val agg = df.agg(
      sum(when(rules.head.bad, 1L).otherwise(0L)).as("b0"),
      rules.tail.zipWithIndex.map { case (r, i) =>
        sum(when(r.bad, 1L).otherwise(0L)).as(s"b${i + 1}") }: _*)
    val stackArgs = rules.zipWithIndex.map { case (r, i) =>
      s"'${r.rule}', '${r.column}', b$i" }.mkString(", ")
    agg.selectExpr(
      s"stack(${rules.size}, $stackArgs) AS (rule, `column`, n_bad)")
  }

  /** Key-uniqueness check: `n_bad` = excess rows beyond one per key. */
  def checkUnique(df: DataFrame, key: String): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("n"))
      .agg(coalesce(sum(col("n") - 1), lit(0L)).as("n_bad"))
      .select(lit("unique").as("rule"), lit(key).as("column"),
        col("n_bad"))

  /** Referential-integrity check: child keys with no parent. The parent
    * side is a whole dimension — data-dependent, so the broadcast is
    * advisor-gated (r17 verdict #4); the byte estimate is over the
    * pruned key column (8 bytes/row), which is all the anti-join ships.
    */
  def checkRef(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame =
    child.join(
        graft.plans.Layout.advisedBroadcast(
          parent.select(parent(parentKey)), fixed = 8L),
        child(childKey) === parent(parentKey), "left_anti")
      .agg(count(lit(1)).as("n_bad"))
      .select(lit("ref_integrity").as("rule"),
        lit(childKey).as("column"), col("n_bad"))

  /** The orders-table expectation suite: fused row-local rules + key
    * uniqueness + FK into customer, one verdict row per rule.
    */
  def ordersSuite(orders: DataFrame, customer: DataFrame): DataFrame = {
    val rowRules = checkRows(orders, Seq(
      RowRule("not_null", "o_orderkey", col("o_orderkey").isNull),
      RowRule("not_null", "o_custkey", col("o_custkey").isNull),
      RowRule("range", "o_totalprice",
        col("o_totalprice") < 0 || col("o_totalprice") > 1e9),
      RowRule("domain", "o_orderstatus",
        !col("o_orderstatus").isin("O", "F", "P"))))
    rowRules
      .unionAll(checkUnique(orders, "o_orderkey"))
      .unionAll(checkRef(orders, "o_custkey", customer, "c_custkey"))
      .withColumn("pass", (col("n_bad") === 0L).cast("int"))
  }

  /** Driver-contract registration (SparkEntry aggregates these). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq_expectations" -> ((s, d) =>
      ordersSuite(Tables.orders(s, d), Tables.customer(s, d))),
  )

  /** DuckDB twin: each rule recomputed independently. */
  def oracleSql: Map[String, String] = Map(
    "dq_expectations" ->
      """WITH checks AS (
        |  SELECT 'not_null' AS rule, 'o_orderkey' AS "column",
        |         CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
        |              AS BIGINT) AS n_bad
        |  FROM orders
        |  UNION ALL
        |  SELECT 'not_null', 'o_custkey',
        |         CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
        |              AS BIGINT)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'range', 'o_totalprice',
        |         CAST(sum(CASE WHEN o_totalprice < 0
        |                        OR o_totalprice > 1000000000.0
        |                       THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'domain', 'o_orderstatus',
        |         CAST(sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
        |                       THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'unique', 'o_orderkey',
        |         CAST(coalesce(sum(n - 1), 0) AS BIGINT)
        |  FROM (SELECT o_orderkey, count(*) AS n FROM orders GROUP BY 1)
        |  UNION ALL
        |  SELECT 'ref_integrity', 'o_custkey',
        |         CAST(count(*) AS BIGINT)
        |  FROM orders o
        |  WHERE NOT EXISTS (SELECT 1 FROM customer c
        |                    WHERE c.c_custkey = o.o_custkey))
        |SELECT rule, "column", n_bad,
        |       CAST(n_bad = 0 AS INT) AS pass
        |FROM checks""".stripMargin,
  )
}

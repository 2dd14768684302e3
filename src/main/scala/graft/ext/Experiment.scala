package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** A/B experiment analysis over the events stream: deterministic variant
  * assignment, per-variant conversion, and Wilson score confidence
  * intervals — the readout every experimentation platform computes, and
  * a natural consumer of the events table the reference ingests
  * (`events` has no analysis stage in `dags/dag.py`).
  *
  * == Determinism contract ==
  * The Wilson interval is pure arithmetic over two exact counts
  * (distinct users, distinct converters): `+ − × ÷ sqrt` are all
  * correctly-rounded IEEE-754 operations, so as long as BOTH engines
  * evaluate the same expression tree over the same integers the result
  * is bit-identical — the oracle SQL mirrors this code's operand order
  * and parenthesization step for step (the same argument as
  * graft.etl.Gold's single-division rule, extended to a fixed DAG of
  * divisions and one square root). All literals are explicit doubles on
  * both sides (DuckDB would otherwise parse `1.96` as DECIMAL).
  *
  * == Scale shape ==
  * One hash aggregate over events; the two distinct counts share the
  * same grouping so Catalyst plans a single expand + two-phase
  * aggregate. Variant cardinality is 2 — the post-aggregate arithmetic
  * is metadata-sized.
  */
object Experiment {

  private val Z = 1.96          // 95% two-sided normal quantile
  private val ZZ = 1.96 * 1.96  // folded in binary64, same bits as oracle's

  /** Per-variant trials, conversions, and the 95% Wilson interval.
    * Variant = `user_id mod 2` — deterministic assignment every engine
    * reproduces (a production rollout would hash a salt+id; the modulus
    * keeps the oracle trivially identical).
    * Conversion = user emitted at least one `purchase` event.
    */
  def wilsonAb(ev: DataFrame): DataFrame = {
    val agg = ev
      .select((col("user_id") % 2).cast("long").as("variant"),
        col("user_id"), col("event_type"))
      .groupBy("variant")
      .agg(countDistinct(col("user_id")).as("n_users"),
        countDistinct(when(col("event_type") === "purchase",
          col("user_id"))).as("n_converted"))
    agg
      .withColumn("p_hat",
        col("n_converted").cast("double") / col("n_users"))
      .withColumn("denom", lit(1.0) + lit(ZZ) / col("n_users"))
      .withColumn("cnum",
        col("p_hat") + lit(ZZ) / (lit(2.0) * col("n_users")))
      .withColumn("rt", sqrt(
        col("p_hat") * (lit(1.0) - col("p_hat")) / col("n_users") +
          lit(ZZ) / (lit(4.0) * (col("n_users") * col("n_users")))))
      .select(col("variant"), col("n_users"), col("n_converted"),
        col("p_hat"),
        (col("cnum") / col("denom") - lit(Z) * col("rt") / col("denom"))
          .as("wilson_lo"),
        (col("cnum") / col("denom") + lit(Z) * col("rt") / col("denom"))
          .as("wilson_hi"))
  }

  /** Driver-contract registration (SparkEntry aggregates these). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ab_test_wilson" -> ((s, d) => wilsonAb(Tables.events(s, d))),
  )

  /** DuckDB twin — intermediate CTE columns pin the operand order to
    * exactly this code's, so every IEEE op rounds identically.
    */
  def oracleSql: Map[String, String] = Map(
    "ab_test_wilson" ->
      """WITH a AS (
        |  SELECT user_id % 2 AS variant,
        |         count(DISTINCT user_id) AS n_users,
        |         count(DISTINCT CASE WHEN event_type = 'purchase'
        |                             THEN user_id END) AS n_converted
        |  FROM events GROUP BY 1),
        |b AS (
        |  SELECT *,
        |         CAST(n_converted AS DOUBLE) / n_users AS p_hat,
        |         CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE) AS zz
        |  FROM a),
        |c AS (
        |  SELECT *,
        |         CAST(1.0 AS DOUBLE) + zz / n_users AS denom,
        |         p_hat + zz / (CAST(2.0 AS DOUBLE) * n_users) AS cnum,
        |         sqrt(p_hat * (CAST(1.0 AS DOUBLE) - p_hat) / n_users +
        |              zz / (CAST(4.0 AS DOUBLE) * (n_users * n_users)))
        |           AS rt
        |  FROM b)
        |SELECT variant, n_users, n_converted, p_hat,
        |       cnum / denom - CAST(1.96 AS DOUBLE) * rt / denom
        |         AS wilson_lo,
        |       cnum / denom + CAST(1.96 AS DOUBLE) * rt / denom
        |         AS wilson_hi
        |FROM c""".stripMargin,
  )
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Blocked fuzzy record linkage (entity resolution).
  *
  * The reference cleans exact duplicates only (`to_silver.py:22-102`);
  * real customer/master-data pipelines also need to link DIRTY records
  * (typos, OCR noise) back to a clean dimension. The canonical shape:
  * (1) block both sides on cheap equality keys so candidates are
  * per-block, never all-pairs; (2) score candidates with an edit
  * distance (Spark's codegen'd `levenshtein`, no UDF); (3) keep each
  * dirty record's best match via a deterministic `row_number` over
  * (distance, key).
  *
  * Scale shape (100 TB): the candidate join shuffles on the block key —
  * cost is Σ|dirty_b|·|clean_b| over blocks, controlled entirely by
  * block granularity (a production run blocks on zip+name-prefix, not a
  * 25-value nation key; the API takes arbitrary block columns, so the
  * caller picks blocks sized for the cluster). `maxDist` prunes scored
  * candidates before the ranking shuffle, so a hot block inflates the
  * levenshtein stage (narrow, codegen'd) but not the exchange — the
  * same guard family as the n-gram df cap in [[graft.ext.Dedup]].
  */
object FuzzyJoin {

  /** Link each record of `dirty` to its best match in `clean`.
    *
    * @param blockCols equality columns present on both sides (candidate
    *                  generation never crosses blocks)
    * @param dirtyKey dirty-side UNIQUE key — best-match ranking
    *                 partitions on it (partitioning on the dirty name
    *                 would merge distinct records whose corrupted names
    *                 collide, and the tie order between them would be
    *                 nondeterministic)
    * @param dirtyName/cleanName string columns to score
    * @param keyCol clean-side unique key for deterministic tie-breaks
    * @param maxDist candidates above this edit distance are dropped
    *                before ranking (a linkage threshold, and a guard
    *                against garbage matches in sparse blocks)
    */
  def linkBestMatch(dirty: DataFrame, clean: DataFrame,
      blockCols: Seq[String], dirtyKey: String, dirtyName: String,
      cleanName: String, keyCol: String, maxDist: Int = 4): DataFrame = {
    val cand = dirty.join(clean, blockCols)
      .withColumn("dist", levenshtein(col(dirtyName), col(cleanName)).cast("long"))
      .filter(col("dist") <= maxDist)
    val best = Window.partitionBy(col(dirtyKey))
      .orderBy(col("dist"), col(keyCol))
    cand.withColumn("rn", row_number().over(best))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Driver query: link a deterministically-corrupted copy of `customer`
    * (one character of the name replaced, position keyed off the custkey)
    * back to the clean table, blocked by nation. `is_correct` audits
    * linkage quality — ties at distance 1 can resolve to a different
    * customer whose name is one edit from the corrupted string, which is
    * precisely the ambiguity a real linkage run must surface.
    */
  def linkCustomers(cust: DataFrame): DataFrame = {
    val dirty = cust.select(
      col("c_custkey").as("d_key"),
      col("c_nationkey"),
      expr("concat(substr(c_name, 1, (c_custkey % 9) + 9), 'X', " +
        "substr(c_name, (c_custkey % 9) + 11))").as("d_name"))
    linkBestMatch(dirty, cust, Seq("c_nationkey"), "d_key", "d_name",
        "c_name", "c_custkey", maxDist = 4)
      .select(
        col("d_key"), col("d_name"),
        col("c_custkey").as("matched_key"),
        col("dist"),
        when(col("d_key") === col("c_custkey"), 1L).otherwise(0L)
          .as("is_correct"))
  }

  /** Driver-contract registration (SparkEntry aggregates these). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "linkage_customers" -> ((s, d) => linkCustomers(Tables.customer(s, d))),
  )

  /** DuckDB twin — same corruption expression, same block join, same
    * `levenshtein`, same (dist, key) tie-break.
    */
  def oracleSql: Map[String, String] = Map(
    "linkage_customers" ->
      """WITH dirty AS (
        |  SELECT c_custkey AS d_key, c_nationkey,
        |         concat(substr(c_name, 1, CAST((c_custkey % 9) + 9 AS INT)),
        |                'X',
        |                substr(c_name, CAST((c_custkey % 9) + 11 AS INT)))
        |           AS d_name
        |  FROM customer),
        |cand AS (
        |  SELECT d.d_key, d.d_name, c.c_custkey,
        |         CAST(levenshtein(d.d_name, c.c_name) AS BIGINT) AS dist
        |  FROM dirty d JOIN customer c ON d.c_nationkey = c.c_nationkey
        |  WHERE levenshtein(d.d_name, c.c_name) <= 4),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY d_key
        |                               ORDER BY dist, c_custkey) AS rn
        |  FROM cand)
        |SELECT d_key, d_name, c_custkey AS matched_key, dist,
        |       CASE WHEN d_key = c_custkey THEN 1 ELSE 0 END AS is_correct
        |FROM ranked WHERE rn = 1""".stripMargin,
  )
}

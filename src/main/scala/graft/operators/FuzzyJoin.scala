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
  * (1) candidate generation by MULTI-PASS BLOCKING — several cheap
  * equality keys, unioned, so candidates are per-block and never
  * all-pairs; (2) candidate scoring with an edit distance (Spark's
  * codegen'd `levenshtein`, no UDF); (3) each dirty record's best match
  * via a deterministic `row_number` over (distance, key).
  *
  * Multi-pass blocking is the recall lever: a single edit cannot corrupt
  * two disjoint substrings at once, so blocking once on a name PREFIX
  * and once on a name SUFFIX guarantees every single-edit corruption
  * still meets its true record in at least one pass (k-edit errors need
  * k+1 passes over disjoint regions). Measured here: nation-only
  * blocking scores 9M candidate pairs at sf0.1 (40 s); nation+prefix ∪
  * nation+suffix scores ~600k (sub-second scoring stage) with identical
  * linkage output, because every distance-1 candidate — and the winner
  * is always at distance 1 — survives blocking by construction.
  *
  * Scale shape (100 TB): each pass is an equi-join shuffling on its
  * block key; cost is Σ|dirty_b|·|clean_b| per pass, controlled by key
  * granularity, and the pass union dedups (dirtyKey, cleanKey) pairs
  * before the levenshtein stage so no pair is scored twice. `maxDist`
  * prunes scored candidates before the best-match ranking exchange.
  */
object FuzzyJoin {

  /** Link each record of `dirty` to its best match in `clean`.
    *
    * @param blockPasses one entry per blocking pass: the equality
    *                    columns (present on both sides) of that pass;
    *                    candidates are the UNION over passes
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
      blockPasses: Seq[Seq[String]], dirtyKey: String, dirtyName: String,
      cleanName: String, keyCol: String, maxDist: Int = 4): DataFrame = {
    require(blockPasses.nonEmpty, "at least one blocking pass")
    val cand = blockPasses.map { bc =>
      dirty.join(clean, bc)
        .select(col(dirtyKey), col(dirtyName), col(keyCol), col(cleanName))
    }.reduce(_ unionAll _)
      .distinct() // a pair found by several passes is scored once
    val scored = cand
      .withColumn("dist",
        levenshtein(col(dirtyName), col(cleanName)).cast("long"))
      .filter(col("dist") <= maxDist)
    val best = Window.partitionBy(col(dirtyKey))
      .orderBy(col("dist"), col(keyCol))
    scored.withColumn("rn", row_number().over(best))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Driver query: link a deterministically-corrupted copy of `customer`
    * (one character of the name replaced, position keyed off the custkey)
    * back to the clean table. Blocking = nation+name-prefix ∪
    * nation+name-suffix (the single edit leaves one of the halves
    * intact, so the true record is always a candidate). `is_correct`
    * audits linkage quality — ties at distance 1 can resolve to a
    * different customer whose name is one edit from the corrupted
    * string, which is precisely the ambiguity a real linkage run must
    * surface.
    */
  def linkCustomers(cust: DataFrame): DataFrame = {
    val dirty = cust.select(
      col("c_custkey").as("d_key"),
      col("c_nationkey"),
      expr("concat(substr(c_name, 1, (c_custkey % 9) + 9), 'X', " +
        "substr(c_name, (c_custkey % 9) + 11))").as("d_name"))
      .withColumn("blk_pre", expr("substr(d_name, 1, 15)"))
      .withColumn("blk_suf", expr("substr(d_name, 16)"))
    val cleanB = cust
      .withColumn("blk_pre", expr("substr(c_name, 1, 15)"))
      .withColumn("blk_suf", expr("substr(c_name, 16)"))
    linkBestMatch(dirty, cleanB,
        Seq(Seq("c_nationkey", "blk_pre"), Seq("c_nationkey", "blk_suf")),
        "d_key", "d_name", "c_name", "c_custkey", maxDist = 4)
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

  /** DuckDB twin — same corruption expression, same two blocking passes,
    * same `levenshtein`, same (dist, key) tie-break.
    */
  def oracleSql: Map[String, String] = Map(
    "linkage_customers" ->
      """WITH dirty AS (
        |  SELECT d_key, c_nationkey, d_name,
        |         substr(d_name, 1, 15) AS blk_pre,
        |         substr(d_name, 16) AS blk_suf
        |  FROM (
        |    SELECT c_custkey AS d_key, c_nationkey,
        |           concat(substr(c_name, 1, CAST((c_custkey % 9) + 9 AS INT)),
        |                  'X',
        |                  substr(c_name, CAST((c_custkey % 9) + 11 AS INT)))
        |             AS d_name
        |    FROM customer)),
        |cleanb AS (
        |  SELECT c_custkey, c_nationkey, c_name,
        |         substr(c_name, 1, 15) AS blk_pre,
        |         substr(c_name, 16) AS blk_suf
        |  FROM customer),
        |cand AS (
        |  SELECT DISTINCT d_key, d_name, c_custkey, c_name FROM (
        |    SELECT d.d_key, d.d_name, c.c_custkey, c.c_name
        |    FROM dirty d JOIN cleanb c
        |      ON d.c_nationkey = c.c_nationkey AND d.blk_pre = c.blk_pre
        |    UNION ALL
        |    SELECT d.d_key, d.d_name, c.c_custkey, c.c_name
        |    FROM dirty d JOIN cleanb c
        |      ON d.c_nationkey = c.c_nationkey AND d.blk_suf = c.blk_suf)),
        |scored AS (
        |  SELECT d_key, d_name, c_custkey,
        |         CAST(levenshtein(d_name, c_name) AS BIGINT) AS dist
        |  FROM cand
        |  WHERE levenshtein(d_name, c_name) <= 4),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY d_key
        |                               ORDER BY dist, c_custkey) AS rn
        |  FROM scored)
        |SELECT d_key, d_name, c_custkey AS matched_key, dist,
        |       CASE WHEN d_key = c_custkey THEN 1 ELSE 0 END AS is_correct
        |FROM ranked WHERE rn = 1""".stripMargin,
  )
}

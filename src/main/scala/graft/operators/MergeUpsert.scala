package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** MERGE / upsert — `MERGE INTO target USING source ON key WHEN MATCHED
  * THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *`, composed from a
  * single full-outer join (Spark has no table-format MERGE without a
  * lakehouse layer; the reference's `mode("overwrite")` full refreshes
  * instead, reference `include/scripts/to_bronze.py:49`).
  *
  * == Scale design ==
  * One shuffle of each side on the merge key — the merge-on-read shape.
  * With the target bucketed by key on disk (see
  * `sources.Bronze.writeBucketed`) the target-side shuffle disappears,
  * and a broadcast source turns the whole merge into a map-only job; at
  * 100 TB that is the difference between rewriting the table and
  * rewriting only matched files.
  *
  * == Semantics (two deliberate deltas from SQL MERGE) ==
  *  - Source-key uniqueness is the caller's contract, validated only on
  *    request (`validateUniqueSource = true` — an extra aggregation over
  *    the source, so off by default on hot paths). With duplicate source
  *    keys the full-outer join fans matched target rows out instead of
  *    raising the `MERGE ... matched multiple times` error a SQL engine
  *    would.
  *  - The update rule is `coalesce(source.c, target.c)`: a matched source
  *    row can never set a column to NULL (unlike `UPDATE SET *`, which
  *    overwrites with NULL). That is the right default for correction
  *    feeds — partial updates patch only the columns they carry — but
  *    callers needing NULL-out semantics must encode a sentinel.
  */
object MergeUpsert {

  /** Upsert `source` into `target` by `keys`: matched rows take every
    * non-null source column (see the no-NULL-update note in the object
    * doc), unmatched target rows pass through, unmatched source rows are
    * inserted. Schemas must match by name. `validateUniqueSource`
    * eagerly asserts at most one source row per key before joining.
    */
  def upsert(target: DataFrame, source: DataFrame,
      keys: Seq[String], validateUniqueSource: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "merge needs at least one key column")
    if (validateUniqueSource) {
      val dup = source.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("__n")).filter(col("__n") > 1).limit(1)
      require(dup.isEmpty,
        s"ambiguous merge: duplicate source keys on (${keys.mkString(",")})")
    }
    require(target.columns.sorted.sameElements(source.columns.sorted),
      s"schemas differ: ${target.columns.mkString(",")} vs " +
        source.columns.mkString(","))
    val t = target.as("t")
    val s = source.as("s")
    val cond = keys.map(k => col(s"t.$k") <=> col(s"s.$k")).reduce(_ && _)
    t.join(s, cond, "full_outer")
      .select(target.columns.toSeq.map(c =>
        coalesce(col(s"s.$c"), col(s"t.$c")).as(c)): _*)
  }

  /** Query: apply a correction feed to the orders snapshot — every key
    * ≡3 (mod 10) is updated (price +10%, status 'U'), every key ≡7 is
    * re-inserted under a fresh key (status 'N').
    */
  def ordersUpsert(ord: DataFrame): DataFrame = {
    val base = ord.select("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate")
    val updates = base.filter(pmod(col("o_orderkey"), lit(10)) === 3)
      .withColumn("o_totalprice", col("o_totalprice") * 1.1)
      .withColumn("o_orderstatus", lit("U"))
    val inserts = base.filter(pmod(col("o_orderkey"), lit(10)) === 7)
      .withColumn("o_orderkey", col("o_orderkey") + 10000000L)
      .withColumn("o_orderstatus", lit("N"))
    upsert(base, updates.unionByName(inserts), Seq("o_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long").as("total_cents"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
  }

  /** CDC apply: fold an (op, seq)-annotated change feed into a snapshot —
    * the `APPLY CHANGES` / CDC-merge primitive of incremental pipelines.
    * Per key only the change with the highest `seqCol` wins (`row_number`
    * over a total order — ties broken by op so reruns are deterministic);
    * a winning 'D' deletes the target row, 'I'/'U' upsert full rows.
    *
    * == Scale design ==
    * One window over the changes (partitioned by key — the feed is small
    * relative to the snapshot) and ONE full-outer join on the merge key,
    * exactly the [[upsert]] shape: bucket the snapshot by key and the
    * join is exchange-free on the big side; broadcast-sized feeds make
    * the apply map-only.
    */
  def applyChanges(target: DataFrame, changes: DataFrame, keys: Seq[String],
      opCol: String = "op", seqCol: String = "seq"): DataFrame = {
    require(keys.nonEmpty, "applyChanges needs at least one key column")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(seqCol).desc, col(opCol))
    val latest = changes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", seqCol)
    val t = target.as("t")
    val s = latest.as("s")
    val cond = keys.map(k => col(s"t.$k") <=> col(s"s.$k")).reduce(_ && _)
    t.join(s, cond, "full_outer")
      .filter(coalesce(col(s"s.$opCol"), lit("")) =!= "D")
      .select(target.columns.toSeq.map(c =>
        coalesce(col(s"s.$c"), col(s"t.$c")).as(c)): _*)
  }

  /** Query: apply a deterministic change feed to the orders snapshot —
    * keys ≡1 (mod 10) deleted, ≡3 updated (+20%, status 'U'), ≡7
    * re-inserted under fresh keys; keys ≡3 (mod 100) additionally
    * deleted at a later sequence number, so last-wins ordering is
    * exercised (their update must NOT survive).
    */
  def ordersCdc(ord: DataFrame): DataFrame = {
    val base = ord.select("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate")
    def change(df: DataFrame, op: String, seq: Int) = df
      .withColumn("op", lit(op)).withColumn("seq", lit(seq))
    val deletes = change(base.filter(pmod(col("o_orderkey"), lit(10)) === 1),
      "D", 1)
    val updates = change(base.filter(pmod(col("o_orderkey"), lit(10)) === 3)
      .withColumn("o_totalprice", col("o_totalprice") * 1.2)
      .withColumn("o_orderstatus", lit("U")), "U", 1)
    val inserts = change(base.filter(pmod(col("o_orderkey"), lit(10)) === 7)
      .withColumn("o_orderkey", col("o_orderkey") + 20000000L)
      .withColumn("o_orderstatus", lit("N")), "I", 1)
    val lateDeletes = change(
      base.filter(pmod(col("o_orderkey"), lit(100)) === 3), "D", 2)
    val feed = deletes.unionByName(updates).unionByName(inserts)
      .unionByName(lateDeletes)
    applyChanges(base, feed, Seq("o_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long").as("total_cents"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
  }

  /** Driver-contract registration (SparkEntry aggregates these). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "merge_upsert" -> ((s, d) => ordersUpsert(Tables.orders(s, d))),
    "cdc_apply"    -> ((s, d) => ordersCdc(Tables.orders(s, d))),
  )

  /** DuckDB twin — the same merge expressed as FULL OUTER + coalesce. */
  def oracleSql: Map[String, String] = Map(
    "merge_upsert" ->
      """WITH src AS (
        |  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
        |         o_totalprice * 1.1 AS o_totalprice, o_orderdate
        |  FROM orders WHERE o_orderkey % 10 = 3
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, o_custkey, 'N',
        |         o_totalprice, o_orderdate
        |  FROM orders WHERE o_orderkey % 10 = 7)
        |SELECT coalesce(s.o_orderkey, t.o_orderkey) AS o_orderkey,
        |       coalesce(s.o_custkey, t.o_custkey) AS o_custkey,
        |       coalesce(s.o_orderstatus, t.o_orderstatus) AS o_orderstatus,
        |       CAST(round(coalesce(s.o_totalprice, t.o_totalprice) * 100)
        |            AS BIGINT) AS total_cents,
        |       strftime(coalesce(s.o_orderdate, t.o_orderdate), '%Y-%m-%d')
        |         AS day
        |FROM orders t FULL OUTER JOIN src s
        |  ON t.o_orderkey = s.o_orderkey""".stripMargin,
    "cdc_apply" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |         o_orderdate
        |  FROM orders),
        |feed AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |         o_orderdate, 'D' AS op, 1 AS seq
        |  FROM base WHERE o_orderkey % 10 = 1
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, 'U', o_totalprice * 1.2,
        |         o_orderdate, 'U', 1
        |  FROM base WHERE o_orderkey % 10 = 3
        |  UNION ALL
        |  SELECT o_orderkey + 20000000, o_custkey, 'N', o_totalprice,
        |         o_orderdate, 'I', 1
        |  FROM base WHERE o_orderkey % 10 = 7
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |         o_orderdate, 'D', 2
        |  FROM base WHERE o_orderkey % 100 = 3),
        |latest AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY o_orderkey
        |               ORDER BY seq DESC, op) AS rn
        |    FROM feed) WHERE rn = 1),
        |merged AS (
        |  SELECT coalesce(s.o_orderkey, t.o_orderkey) AS o_orderkey,
        |         coalesce(s.o_custkey, t.o_custkey) AS o_custkey,
        |         coalesce(s.o_orderstatus, t.o_orderstatus)
        |           AS o_orderstatus,
        |         coalesce(s.o_totalprice, t.o_totalprice) AS o_totalprice,
        |         coalesce(s.o_orderdate, t.o_orderdate) AS o_orderdate,
        |         s.op AS op
        |  FROM base t FULL OUTER JOIN latest s
        |    ON t.o_orderkey = s.o_orderkey)
        |SELECT o_orderkey, o_custkey, o_orderstatus,
        |       CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents,
        |       strftime(o_orderdate, '%Y-%m-%d') AS day
        |FROM merged WHERE coalesce(op, '') <> 'D'""".stripMargin,
  )
}

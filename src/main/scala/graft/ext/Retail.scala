package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Retail analytics over the order/lineitem fact: ABC (Pareto)
  * classification and market-basket association scores — the two
  * assortment-analysis queries every commerce warehouse runs, absent
  * from the reference's Gold layer (`to_gold.py:25-132` stops at
  * per-entity aggregates).
  *
  * Both are exact-integer to the last step: revenues are integer cents,
  * supports are counts, and the single IEEE division (share, lift) is
  * the identical expression on both engines — the same determinism
  * contract as graft.etl.Gold.
  */
object Retail {

  private def cents(c: String) =
    round(col(c) * 100).cast("long")

  /** ABC / Pareto classification: parts ranked by revenue descending,
    * classified A while the running revenue share is ≤ 80%, B to 95%,
    * C above — boundaries tested on EXACT integers
    * (`cum*100 <= total*80`), never on a floating share.
    *
    * The global cumulative sum over revenue-descending order is the
    * scale hazard (a naive window is one partition). Same decomposition
    * as [[graft.etl.TimeSeries.sessionConcurrency]]: DIGIT-COUNT BANDS
    * of `rev_cents` are ordered blocks of the global revenue order
    * (every 6-digit revenue exceeds every 5-digit one), so a per-band
    * running sum (shuffle on band, parallel) plus a band-level carry
    * (≤ 19 rows — a Long has at most 19 digits — so its unpartitioned
    * window is metadata-sized) reconstructs the global prefix sum
    * exactly. Ties inside a band are totally ordered by
    * (rev desc, partkey).
    */
  def abcClassification(li: DataFrame): DataFrame = {
    // materialize the per-part revenue once: it feeds the banded running
    // sum, the band carry AND the grand total — without this the fact
    // scan + aggregate runs three times (visible as 3 Scan nodes in the
    // unfixed plan)
    val rev = graft.CheckpointLease.track(
      li.groupBy("l_partkey")
        .agg(sum(cents("l_extendedprice")).as("rev_cents"))
        .localCheckpoint())
    val banded = rev.withColumn("band",
      length(col("rev_cents").cast("string")).cast("int"))
    val wBand = Window.partitionBy("band")
      .orderBy(col("rev_cents").desc, col("l_partkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withRun = banded.withColumn("run", sum("rev_cents").over(wBand))
    // carry = total of all strictly-higher bands; ≤19 rows, see scaladoc
    val carry = banded.groupBy("band").agg(sum("rev_cents").as("band_total"))
      .withColumn("carry", coalesce(sum("band_total").over(
        Window.orderBy(col("band").desc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("band", "carry")
    val total = rev.agg(sum("rev_cents").as("total_cents"))
    withRun.join(broadcast(carry), Seq("band"))
      .crossJoin(broadcast(total))
      .withColumn("cum_cents", col("run") + col("carry"))
      .select(
        col("l_partkey"), col("rev_cents"), col("cum_cents"),
        (col("cum_cents").cast("double") / col("total_cents"))
          .as("cum_share"),
        when(col("cum_cents") * 100 <= col("total_cents") * 80, "A")
          .when(col("cum_cents") * 100 <= col("total_cents") * 95, "B")
          .otherwise("C").as("abc_class"))
  }

  /** Market-basket association: for part pairs co-occurring in at least
    * `minSupport` orders, support counts and lift =
    * P(a,b)/(P(a)P(b)) = n_ab·n_orders/(n_a·n_b). Top-`k` pairs by
    * (co-occurrence count desc, pair key) — the tie-break never reads
    * the float lift, so the cut is deterministic.
    *
    * Scale shape: the pair explosion is the [[Graph.coPurchaseEdges]]
    * shape (order-keyed self-join, fan-out bounded by order size; a
    * production run caps items-per-order first); supports are two
    * count aggregates; the order total rides a broadcast 1-row
    * cross-join so no driver-side action exists in the plan.
    */
  def basketLift(li: DataFrame, minSupport: Int = 3, k: Int = 100): DataFrame = {
    // materialized once: feeds the pair self-join (twice), part counts,
    // and the order total — four scans otherwise
    val lo = graft.CheckpointLease.track(
      li.select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
        .localCheckpoint())
    val partCnt = lo.groupBy("pk").agg(count(lit(1)).as("n_p"))
    val total = lo.groupBy().agg(countDistinct("ok").as("n_orders"))
    val pairs = lo.as("a").join(lo.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("part_a"), col("b.pk").as("part_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
    pairs
      .join(partCnt.select(col("pk").as("part_a"), col("n_p").as("n_a")),
        Seq("part_a"))
      .join(partCnt.select(col("pk").as("part_b"), col("n_p").as("n_b")),
        Seq("part_b"))
      .crossJoin(broadcast(total))
      .select(col("part_a"), col("part_b"), col("n_ab"), col("n_a"),
        col("n_b"),
        ((col("n_ab") * col("n_orders")).cast("double") /
          (col("n_a") * col("n_b")).cast("double")).as("lift"))
      .orderBy(col("n_ab").desc, col("part_a"), col("part_b"))
      .limit(k)
  }

  /** Driver-contract registration (SparkEntry aggregates these). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "abc_parts" -> ((s, d) => abcClassification(Tables.lineitem(s, d))),
    "basket_lift" -> ((s, d) => basketLift(Tables.lineitem(s, d))),
  )

  /** DuckDB twins — the ABC oracle uses the plain single global window
    * the banded decomposition must reproduce exactly.
    */
  def oracleSql: Map[String, String] = Map(
    "abc_parts" ->
      """WITH rev AS (
        |  SELECT l_partkey,
        |         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |              AS BIGINT) AS rev_cents
        |  FROM lineitem GROUP BY 1),
        |cum AS (
        |  SELECT l_partkey, rev_cents,
        |         CAST(sum(rev_cents) OVER (
        |           ORDER BY rev_cents DESC, l_partkey
        |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents,
        |         CAST(sum(rev_cents) OVER () AS BIGINT) AS total_cents
        |  FROM rev)
        |SELECT l_partkey, rev_cents, cum_cents,
        |       CAST(cum_cents AS DOUBLE) / total_cents AS cum_share,
        |       CASE WHEN cum_cents * 100 <= total_cents * 80 THEN 'A'
        |            WHEN cum_cents * 100 <= total_cents * 95 THEN 'B'
        |            ELSE 'C' END AS abc_class
        |FROM cum""".stripMargin,
    "basket_lift" ->
      """WITH lo AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |pc AS (SELECT pk, count(*) AS n_p FROM lo GROUP BY 1),
        |tot AS (SELECT count(DISTINCT ok) AS n_orders FROM lo),
        |pairs AS (
        |  SELECT a.pk AS part_a, b.pk AS part_b, count(*) AS n_ab
        |  FROM lo a JOIN lo b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2
        |  HAVING count(*) >= 3)
        |SELECT p.part_a, p.part_b, p.n_ab, ca.n_p AS n_a, cb.n_p AS n_b,
        |       CAST(p.n_ab * (SELECT n_orders FROM tot) AS DOUBLE) /
        |         CAST(ca.n_p * cb.n_p AS DOUBLE) AS lift
        |FROM pairs p
        |JOIN pc ca ON p.part_a = ca.pk
        |JOIN pc cb ON p.part_b = cb.pk
        |ORDER BY p.n_ab DESC, p.part_a, p.part_b
        |LIMIT 100""".stripMargin,
  )
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Bloom

/** Bloom-pruned shuffle join: build a Bloom filter over the (selective)
  * dim side's join keys, drop non-joining fact rows inside the fact scan
  * stage, then run the real join on the survivors.
  *
  * This is the semi-join reduction every warehouse engine applies when a
  * fact⋈dim join is selective but the dim side is too large to broadcast
  * as a hash table: the filter is tens of bits per key (MBs where the
  * hash relation would be GBs), false positives only cost a little extra
  * shuffle (the join still discards them), and false negatives don't
  * exist — so the result is row-identical to the plain join, which is
  * exactly what the oracle checks. Spark's own runtime bloom rewrite
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) applies the same
  * trick adaptively; this operator makes it explicit, deterministic, and
  * available when the optimizer's cost model declines.
  *
  * == Scale design ==
  * The filter build is one narrow pass over the dim keys (per-partition
  * bitsets OR-merged, [[Bloom.build]]); the probe is a codegen'd
  * expression in the fact scan stage, BEFORE the exchange — the pruned
  * rows never shuffle. The fact side never collects; the only driver
  * state is the filter itself (capped at 16 MiB).
  */
object BloomJoin {

  /** Build a serialized Bloom filter over `df`'s `keyCol` (BIGINT keys).
    * Sizing counts the keys first (a cheap aggregate on the already-
    * filtered dim); pass `expectedKeys` to skip that pass when the caller
    * knows the cardinality.
    */
  def buildFilter(df: DataFrame, keyCol: String, fpp: Double = 0.01,
      expectedKeys: Long = -1L): Array[Byte] = {
    import df.sparkSession.implicits._
    val n = if (expectedKeys >= 0) expectedKeys else df.count()
    val bits = Bloom.optimalNumBits(n, fpp)
    val k = Bloom.optimalNumHashes(bits, n)
    Bloom.build(df.select(col(keyCol).cast("long")).as[Long], bits, k)
  }

  /** `fact ⋈ dim` on `factKey = dimKey`, with the fact side pre-pruned by
    * a Bloom filter of the dim keys. Row-identical to the plain join.
    */
  def bloomPrunedJoin(fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String, fpp: Double = 0.01): DataFrame = {
    val filter = buildFilter(dim, dimKey, fpp)
    // shuffle_hash pins the regime the operator is FOR (dim too large to
    // broadcast): at test SF Catalyst would broadcast the dim and the
    // bloom prune would be dead weight in the measured plan
    fact.filter(Bloom.mightContain(filter, col(factKey).cast("long")))
      .join(dim.hint("shuffle_hash"), col(factKey) === col(dimKey))
  }

  /** Driver query: revenue of line items belonging to urgent open orders
    * — a selective dim (~1/15 of orders) joined against the full lineitem
    * fact, the canonical bloom-prune shape. Compact rollup by return flag
    * keeps the verify output scalar and small while every fact row flows
    * through the probe.
    */
  def urgentRevenueByReturnFlag(lineitem: DataFrame,
      orders: DataFrame): DataFrame = {
    val dim = orders.filter(col("o_orderpriority") === "1-URGENT" &&
      col("o_orderstatus") === "O")
      .select("o_orderkey", "o_orderpriority")
    bloomPrunedJoin(lineitem, "l_orderkey", dim, "o_orderkey")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice")) * 100).cast("long")
          .as("revenue_cents"))
  }

  /** Driver-contract registration (SparkEntry aggregates these). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_bloom_pruned" -> ((s, d) =>
      urgentRevenueByReturnFlag(Tables.lineitem(s, d), Tables.orders(s, d))),
  )

  /** DuckDB twin: the PLAIN join — pruning must not change the answer. */
  def oracleSql: Map[String, String] = Map(
    "join_bloom_pruned" ->
      """SELECT l.l_returnflag, count(*) AS n_items,
        |       CAST(round(sum(l.l_extendedprice) * 100) AS BIGINT)
        |         AS revenue_cents
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderpriority = '1-URGENT' AND o.o_orderstatus = 'O'
        |GROUP BY l.l_returnflag""".stripMargin,
  )
}

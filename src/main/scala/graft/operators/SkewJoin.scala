package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Salted shuffle join — the skew mitigation for a fact⋈dim join whose
  * fact side hammers a few hot keys but whose dim side is too large to
  * broadcast.
  *
  * A plain shuffle join hash-partitions both sides by the key, so one hot
  * key lands its entire fact volume on ONE reducer: at 100 TB a single
  * celebrity key turns a 1000-executor join into a 1-executor join.
  * Salting splits every key into `salts` sub-keys: the fact side derives a
  * deterministic salt from one of its own columns (uniform within a key),
  * the dim side replicates each row once per salt value, and the join runs
  * on (key, salt) — the hot key's rows now spread over `salts` reducers.
  * Cost: the dim side shuffles `salts`× its size, which is the standard
  * trade (dim ≪ fact is the precondition for choosing this plan).
  *
  * The salt is dropped before returning, so the result is row-identical
  * to the unsalted join — which is exactly what the DuckDB oracle checks
  * (the oracle runs the PLAIN join; salting must be invisible in the
  * output). AQE's skew-join split is the runtime alternative, but it only
  * splits oversized PARTITIONS after a sort-merge shuffle; explicit
  * salting also covers hash-aggregate-feeding joins and engines/configs
  * where AQE is off, and documents the intent in the plan itself.
  */
object SkewJoin {

  /** Join `fact` to `dim` on `factKey = dimKey`, salted `salts` ways.
    * `saltSrc` must be a fact-side expression that varies within a key
    * (a line number, a row id) — it is hashed to pick the sub-key, so
    * correctness never depends on its distribution, only spread does.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String, saltSrc: Column,
      salts: Int = 16): DataFrame = {
    require(salts >= 1, "salt fan-out must be positive")
    val f = fact.withColumn("__salt",
      pmod(xxhash64(saltSrc), lit(salts.toLong)).cast("int"))
    val d = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    f.join(d, f(factKey) === d(dimKey) &&
        f("__salt") === d("__salt"))
      .drop("__salt")
  }

  /** Revenue by order priority through the salted lineitem⋈orders join —
    * the aggregate makes the query's output compact while every fact row
    * still flows through the salted shuffle. l_linenumber seeds the salt:
    * it cycles 1..7 within an order, so a hot order key spreads evenly.
    */
  def revenueByPriority(lineitem: DataFrame, orders: DataFrame): DataFrame =
    // The shuffle_hash hint pins the shuffled-join regime the operator is
    // FOR: at bench SF the exploded dim fits the broadcast threshold and
    // Catalyst would broadcast it — a plan where the salt is dead weight
    // (broadcast joins have no reducer skew). Production precondition is
    // "dim too large to broadcast", so the demo measures that path.
    saltedJoin(lineitem, orders.hint("shuffle_hash"), "l_orderkey",
        "o_orderkey", col("l_linenumber"), salts = 8)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        // cents-rounded long, matching the repo's stable-double-sum
        // pattern (sub-half-cent float drift can't flip the rounded sum)
        round(sum(col("l_extendedprice")) * 100).cast("long")
          .as("revenue_cents"))

  /** Share of the predicted pair volume above which
    * [[joinExplosionProfile]] recommends salting a key. */
  val SaltShareThreshold = 0.1

  /** JOIN-EXPLOSION PRE-FLIGHT — the report that decides when
    * [[saltedJoin]] is worth its dim-replication cost, computed BEFORE
    * paying the shuffle: for a self-equi-join on `user_id` (the
    * sessionization/attribution shape), the exact output size is
    * `Σ c(k)²` over per-key counts, and the top keys' `c(k)²` shares
    * show whether one reducer would take the whole join. One row per
    * top-`topN` key: its row count, pair contribution, share of the
    * predicted join output, and the salt verdict.
    *
    * Everything derives from ONE key-count aggregate (map-side partials
    * absorb the hot keys — the profile itself cannot skew); the top-N
    * is a TakeOrdered, the totals a single-row broadcast. Exact
    * integers throughout, one IEEE division per share.
    */
  def joinExplosionProfile(ev: DataFrame, topN: Int = 10): DataFrame = {
    val counts = ev.groupBy(col("user_id").as("key"))
      .agg(count(lit(1)).as("cnt"))
    val tot = counts.agg(
      count(lit(1)).as("n_keys"),
      sum("cnt").as("total_rows"),
      sum(col("cnt") * col("cnt")).as("predicted_pairs"))
    counts.orderBy(col("cnt").desc, col("key")).limit(topN)
      .crossJoin(broadcast(tot))
      .select(col("key"), col("cnt"),
        (col("cnt") * col("cnt")).as("key_pairs"),
        col("n_keys"), col("total_rows"), col("predicted_pairs"),
        ((col("cnt") * col("cnt")).cast("double") /
          col("predicted_pairs").cast("double")).as("pair_share"),
        (((col("cnt") * col("cnt")).cast("double") /
          col("predicted_pairs").cast("double")) > SaltShareThreshold)
          .as("needs_salt"))
  }

  /** Driver-contract registration (SparkEntry aggregates these). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_salted" -> ((s, d) =>
      revenueByPriority(Tables.lineitem(s, d), Tables.orders(s, d))),
    "join_explosion_profile" -> ((s, d) =>
      joinExplosionProfile(Tables.events(s, d))),
  )

  /** DuckDB twin: the PLAIN join — salting must not change the answer. */
  def oracleSql: Map[String, String] = Map(
    "join_explosion_profile" ->
      s"""WITH counts AS (
         |  SELECT user_id AS key, count(*) AS cnt
         |  FROM events GROUP BY 1),
         |tot AS (
         |  SELECT count(*) AS n_keys,
         |         CAST(sum(cnt) AS BIGINT) AS total_rows,
         |         CAST(sum(cnt * cnt) AS BIGINT) AS predicted_pairs
         |  FROM counts),
         |top AS (
         |  SELECT key, cnt FROM counts
         |  ORDER BY cnt DESC, key LIMIT 10)
         |SELECT t.key, t.cnt, t.cnt * t.cnt AS key_pairs,
         |       o.n_keys, o.total_rows, o.predicted_pairs,
         |       CAST(t.cnt * t.cnt AS DOUBLE) /
         |         CAST(o.predicted_pairs AS DOUBLE) AS pair_share,
         |       (CAST(t.cnt * t.cnt AS DOUBLE) /
         |         CAST(o.predicted_pairs AS DOUBLE)) > $SaltShareThreshold
         |         AS needs_salt
         |FROM top t CROSS JOIN tot o""".stripMargin,
    "join_salted" ->
      """SELECT o.o_orderpriority, count(*) AS n_items,
        |       CAST(round(sum(l.l_extendedprice) * 100) AS BIGINT)
        |         AS revenue_cents
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1""".stripMargin,
  )
}

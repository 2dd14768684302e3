package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Exact distributed heavy hitters with bounded memory: per-partition
  * Misra–Gries candidate generation followed by an exact recount of the
  * (small) candidate set — the standard two-pass "frequent items" pattern
  * for domains too wide to hash-aggregate outright.
  *
  * Misra–Gries with `slots` counters guarantees any item with partition
  * frequency > n_p/slots survives its partition; by pigeonhole, an item
  * with GLOBAL frequency > N/slots must exceed that bound in at least one
  * partition, so with `slots ≥ 1/minFrac` (enforced) the candidate set is
  * a superset of every true heavy hitter. The exact recount then removes
  * candidate false positives, so the final output is EXACT and
  * deterministic under any partitioning — which is what lets the DuckDB
  * oracle check it with a plain GROUP BY ... HAVING.
  *
  * == Scale design ==
  * Pass 1 is narrow (`mapPartitions`, O(slots) state per task, iterator-
  * streamed). Pass 2 shuffles ONLY rows whose item survives the broadcast
  * candidate filter — at 100 TB the exchange carries the heavy tail, not
  * the long tail of singletons (the thing that makes a naive global
  * groupBy over a web-scale token domain slow). The global total rides a
  * 1-row broadcast cross join, never a single-partition window.
  */
object HeavyHitters {

  /** Items (single string column `item`) with frequency ≥ minFrac of the
    * total, exactly. `slots` bounds pass-1 state; must be ≥ 1/minFrac for
    * the no-false-negative guarantee.
    */
  def frequent(items: DataFrame, minFrac: Double,
      slots: Int = 4096): DataFrame = {
    require(minFrac > 0 && minFrac <= 1, s"minFrac=$minFrac out of (0,1]")
    require(slots.toDouble * minFrac >= 1.0,
      s"slots=$slots < 1/minFrac=${1 / minFrac}: Misra-Gries could drop a " +
        "true heavy hitter")
    import items.sparkSession.implicits._
    val candidates = items.select(col("item")).as[String]
      .mapPartitions { it =>
        val counts = scala.collection.mutable.HashMap.empty[String, Long]
        it.foreach { s =>
          counts.get(s) match {
            case Some(c) => counts(s) = c + 1
            case None if counts.size < slots => counts(s) = 1L
            case None =>
              // decrement-all: the classic MG step — every tracked count
              // drops by one, zeros evicted, the new item is NOT admitted
              val dead = List.newBuilder[String]
              counts.keysIterator.foreach { k =>
                val c = counts(k) - 1
                if (c == 0) dead += k else counts(k) = c
              }
              dead.result().foreach(counts.remove)
          }
        }
        counts.keysIterator
      }
      .toDF("item").distinct()
    val total = items.agg(count(lit(1)).as("total"))
    items
      .join(broadcast(candidates), Seq("item"))
      .groupBy("item")
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") >= ceil(lit(minFrac) * col("total")))
      .select(col("item"), col("cnt"),
        (col("cnt") * lit(1.0) / col("total")).as("frac"))
  }

  /** Driver query: corpus tokens occurring in ≥ 0.2% of all token
    * positions — the vocabulary head a tokenizer/stopword pass wants.
    */
  def frequentTokens(docs: DataFrame, minFrac: Double = 0.002): DataFrame =
    frequent(
      docs.select(explode(split(col("text"), " ")).as("item")), minFrac)
      .withColumnRenamed("item", "token")

  /** Driver-contract registration (SparkEntry aggregates these). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_heavy_hitters" -> ((s, d) =>
      frequentTokens(Tables.documents(s, d))),
  )

  /** DuckDB twin: plain exact GROUP BY/HAVING — the sketch must be
    * invisible in the output.
    */
  def oracleSql: Map[String, String] = Map(
    "text_heavy_hitters" ->
      """WITH tok AS (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        |tot AS (SELECT count(*) AS total FROM tok)
        |SELECT token, count(*) AS cnt,
        |       count(*) * 1.0 / (SELECT total FROM tot) AS frac
        |FROM tok
        |GROUP BY token
        |HAVING count(*) >= ceil(0.002 * (SELECT total FROM tot))""".stripMargin,
  )
}

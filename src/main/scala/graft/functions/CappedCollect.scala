package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** BOUNDED-STATE collect_list: accumulates at most `cap` elements per
  * group, on the map side AND at every merge — the aggregation state for
  * a group can never exceed `cap` values no matter how many rows the
  * group has.
  *
  * This is the piece that makes a df-capped inverted index ONE skew-free
  * shuffle. `collect_list` cannot bound its merge state (a planet-scale
  * stop-shingle's full posting list lands in one task's buffer before
  * any filter can drop it), and a `count(*) OVER (PARTITION BY shingle)`
  * window cannot partially aggregate (same co-location). Pairing
  * `count(1)` (partial-aggregating, exact) with a capped list in one
  * `groupBy(shingle)` gives both numbers in a single shuffle:
  *
  *   - `df <= cap`  → nothing was ever truncated, the list is COMPLETE;
  *   - `df > cap`   → the row is a stop-shingle and is dropped anyway —
  *                    the truncated contents are never observed.
  *
  * A hot key's reduce-side input is #map-partials × cap values, each
  * partial pre-truncated map-side, and the running merge state stays
  * ≤ cap — bounded by cluster width, not data. Element order inside the
  * buffer is merge-order-dependent, which is only observable for
  * `df > cap` groups (dropped); consumers `sort_array` the survivors,
  * so results are deterministic.
  *
  * Buffers are plain JVM objects mutated in place
  * (`ScalaAggregator` is a `TypedImperativeAggregate`); the encoder
  * only runs at partial-serialization boundaries.
  */
class CappedLongList(cap: Int)
    extends Aggregator[Long, (Int, List[Long]), Seq[Long]] {
  override def zero: (Int, List[Long]) = (0, Nil)
  override def reduce(b: (Int, List[Long]), v: Long): (Int, List[Long]) =
    if (b._1 >= cap) b else (b._1 + 1, v :: b._2)
  override def merge(a: (Int, List[Long]),
      b: (Int, List[Long])): (Int, List[Long]) =
    if (a._1 >= cap) a
    else if (b._1 == 0) a
    else {
      val take = math.min(b._1, cap - a._1)
      (a._1 + take, b._2.take(take) ::: a._2)
    }
  override def finish(b: (Int, List[Long])): Seq[Long] = b._2
  override def bufferEncoder: Encoder[(Int, List[Long])] =
    Encoders.tuple(Encoders.scalaInt,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Long]]())
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

/** [[CappedLongList]] over (long, long) pairs — the weighted-posting
  * (doc_id, tf) form the tf-idf index aggregates. Same bounded-state
  * contract.
  */
class CappedLongPairList(cap: Int)
    extends Aggregator[(Long, Long), (Int, List[(Long, Long)]),
      Seq[(Long, Long)]] {
  override def zero: (Int, List[(Long, Long)]) = (0, Nil)
  override def reduce(b: (Int, List[(Long, Long)]),
      v: (Long, Long)): (Int, List[(Long, Long)]) =
    if (b._1 >= cap) b else (b._1 + 1, v :: b._2)
  override def merge(a: (Int, List[(Long, Long)]),
      b: (Int, List[(Long, Long)])): (Int, List[(Long, Long)]) =
    if (a._1 >= cap) a
    else if (b._1 == 0) a
    else {
      val take = math.min(b._1, cap - a._1)
      (a._1 + take, b._2.take(take) ::: a._2)
    }
  override def finish(b: (Int, List[(Long, Long)])): Seq[(Long, Long)] =
    b._2
  override def bufferEncoder: Encoder[(Int, List[(Long, Long)])] =
    Encoders.tuple(Encoders.scalaInt,
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[List[(Long, Long)]]())
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[Seq[(Long, Long)]]()
}

object CappedCollect {
  /** `capped_collect(col, cap)` → array<long> with ≤ cap elements. */
  def cappedLongs(c: Column, cap: Int): Column =
    udaf(new CappedLongList(cap), Encoders.scalaLong)(c)

  /** Capped collect of (a, b) long pairs (two input columns — the
    * tuple encoder flattens to two scalar parameters) →
    * array<struct<_1: long, _2: long>>.
    */
  def cappedLongPairs(a: Column, b: Column, cap: Int): Column =
    udaf(new CappedLongPairList(cap),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))(a, b)
}

package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming RATE/SPIKE MONITOR with bounded per-key state — the
  * alerting primitive every event pipeline runs ("this event type is
  * suddenly arriving at 2× its recent rate"): per event type, the
  * count of each event-time minute is compared against the truncated
  * exponentially-weighted average of the previous
  * [[EwmaDepth]] OBSERVED minutes (α = 1/2 — exact dyadic weights, the
  * [[graft.etl.WindowOps.ewmaCustomerSpend]] determinism argument), and
  * a spike fires when `count > SpikeFactor · ewma_prev`.
  *
  * State per event type is the last [[EwmaDepth]]+1 (minute, count)
  * pairs — O(types · k) regardless of stream length; a minute that
  * spans micro-batches MERGES into its state entry, and each batch
  * re-emits the affected minutes (Update mode). The registered batch
  * query `stream_rate_monitor` ([[EventsStreaming]]) computes the same
  * scores with the lag-window device over the full history — the
  * streaming arm converges to it batch-by-batch, which
  * RateMonitorStreamSpec asserts on an in-order replay.
  */
object RateMonitorStream {

  /** Prior observed minutes folded into the EWMA baseline. */
  val EwmaDepth = 8

  /** Rate multiple over the baseline that raises a spike (exact
    * dyadic, so both engines' compares see identical doubles). */
  val SpikeFactor = 2.0

  case class MinuteEvent(event_type: String, minute: Long)

  case class RateState(minutes: Array[Long], counts: Array[Long])

  case class RateAlert(event_type: String, minute: Long, n_events: Long,
      ewma_prev: Option[Double], is_spike: Boolean)

  /** Normalized truncated EWMA of the prior counts (most recent
    * FIRST), weight (1/2)^j on the j-th most recent — None with no
    * history. Shared by the state function and the spec's reference.
    */
  private[streaming] def ewmaPrev(history: Seq[Long]): Option[Double] = {
    if (history.isEmpty) None
    else {
      var num = 0.0
      var den = 0.0
      var w = 0.5
      history.foreach { c => num += c.toDouble * w; den += w; w *= 0.5 }
      Some(num / den)
    }
  }

  def update(k: Int): (String, Iterator[MinuteEvent],
      GroupState[RateState]) => Iterator[RateAlert] =
    (etype, events, state) => {
      val batch = scala.collection.mutable.SortedMap.empty[Long, Long]
      events.foreach(e =>
        batch(e.minute) = batch.getOrElse(e.minute, 0L) + 1L)
      var hist = state.getOption
        .map(s => s.minutes.zip(s.counts).toVector)
        .getOrElse(Vector.empty)
      val out = batch.toSeq.map { case (m, c) =>
        val idx = hist.indexWhere(_._1 == m)
        val merged =
          if (idx >= 0) hist.updated(idx, (m, hist(idx)._2 + c))
          else hist :+ ((m, c))
        hist = merged.sortBy(_._1).takeRight(k + 1)
        val total = hist.find(_._1 == m).map(_._2).getOrElse(c)
        val prior = hist.filter(_._1 < m).sortBy(-_._1).take(k).map(_._2)
        val e = ewmaPrev(prior)
        RateAlert(etype, m, total, e,
          e.exists(x => total.toDouble > SpikeFactor * x))
      }
      state.update(RateState(hist.map(_._1).toArray,
        hist.map(_._2).toArray))
      out.iterator
    }

  /** Streaming per-type rate monitor (Update mode, bounded state). */
  def rateMonitorStream(ds: Dataset[MinuteEvent],
      k: Int = EwmaDepth): Dataset[RateAlert] = {
    implicit val enc = Encoders.product[RateAlert]
    implicit val stateEnc = Encoders.product[RateState]
    ds.groupByKey(_.event_type)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(update(k))
  }
}

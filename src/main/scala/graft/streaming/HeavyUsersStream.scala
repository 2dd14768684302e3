package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy-hitter tracking with BOUNDED state: a Misra–Gries
  * summary of the top users per event type, maintained with
  * `flatMapGroupsWithState` — the streaming twin of
  * [[EventsStreaming.topUsersBatch]] (exact) and the per-key analogue of
  * [[graft.ext.HeavyHitters]]'s batch Misra–Gries + exact-recount pass.
  *
  * State per event type is AT MOST `k` (user, lower-bound-count)
  * counters, independent of stream length or user cardinality — the
  * property that makes per-key frequency tracking viable on an unbounded
  * stream where exact per-user counts would grow without limit. The MG
  * guarantee transfers: any user with frequency > n/(k+1) of the type's
  * events is guaranteed to be among the counters, and each counter's
  * value is an undercount by at most the total decrement amount.
  * After each micro-batch the group emits its current candidate set
  * (Update mode), so the sink always has the latest summary; a
  * production deployment would periodically run the exact batch twin
  * over the candidates to re-anchor true counts (the HeavyHitters
  * recount pattern).
  */
object HeavyUsersStream {

  /** Counters kept per event type (the MG `k`). */
  val DefaultCounters = 8

  case class TypedEvent(event_type: String, user_id: Long)

  case class MGState(users: Array[Long], counts: Array[Long])

  case class Candidate(event_type: String, user_id: Long, min_count: Long)

  /** One Misra–Gries update step over a batch of user ids. */
  private[streaming] def mgUpdate(users: scala.collection.mutable.LinkedHashMap[Long, Long],
      uid: Long, k: Int): Unit = {
    if (users.contains(uid)) users(uid) += 1L
    else if (users.size < k) users(uid) = 1L
    else {
      // decrement-all: drop every counter by one, evict zeros
      val dead = scala.collection.mutable.ArrayBuffer.empty[Long]
      users.keysIterator.foreach { u =>
        val c = users(u) - 1L
        if (c == 0L) dead += u else users(u) = c
      }
      dead.foreach(users.remove)
    }
  }

  def update(k: Int): (String, Iterator[TypedEvent], GroupState[MGState]) => Iterator[Candidate] =
    (eventType, events, state) => {
      val users = scala.collection.mutable.LinkedHashMap.empty[Long, Long]
      state.getOption.foreach { s =>
        s.users.zip(s.counts).foreach { case (u, c) => users(u) = c }
      }
      events.foreach(e => mgUpdate(users, e.user_id, k))
      state.update(MGState(users.keys.toArray, users.values.toArray))
      users.iterator.map { case (u, c) => Candidate(eventType, u, c) }
    }

  /** Streaming Misra–Gries heavy users per event type (Update mode). */
  def heavyUsersStream(ds: Dataset[TypedEvent],
      k: Int = DefaultCounters): Dataset[Candidate] = {
    implicit val enc = Encoders.product[Candidate]
    implicit val stateEnc = Encoders.product[MGState]
    ds.groupByKey(_.event_type)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(update(k))
  }
}

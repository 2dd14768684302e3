package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom arbitrary-state streaming (SURVEY.md §2.9 mandate:
  * `KeyValueGroupedDataset.flatMapGroupsWithState`): per-user running
  * totals with explicit state, beyond what windowed aggregation can
  * express (e.g. "emit an update whenever a user's lifetime spend crosses
  * a threshold multiple").
  *
  * State is one small record per active user — O(users) regardless of
  * stream length — and Spark checkpoints it per micro-batch; with event-
  * time timeouts a production deployment would expire idle users.
  */
object StatefulSessions {

  case class UserEvent(user_id: Long, event_type: String, value: Double)

  case class UserState(nEvents: Long, valueCents: Long)

  case class UserUpdate(user_id: Long, n_events: Long, value_cents: Long,
      crossed_thousands: Long)

  val update: (Long, Iterator[UserEvent], GroupState[UserState]) => Iterator[UserUpdate] =
    (userId, events, state) => {
      val prev = state.getOption.getOrElse(UserState(0L, 0L))
      var n = prev.nEvents
      var cents = prev.valueCents
      events.foreach { e =>
        n += 1
        cents += math.round(e.value * 100)
      }
      state.update(UserState(n, cents))
      // one update per batch per active user, with the number of whole
      // 1000-unit thresholds the lifetime value has crossed
      Iterator.single(UserUpdate(userId, n, cents, cents / 100000))
    }

  /** Streaming: arbitrary-state running totals (Update mode). */
  def userTotalsStream(ds: Dataset[UserEvent]): Dataset[UserUpdate] = {
    implicit val enc = Encoders.product[UserUpdate]
    implicit val stateEnc = Encoders.product[UserState]
    ds.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(update)
  }
}

package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class HeavyUsersStreamSpec extends SparkSpec {
  import spark.implicits._
  import HeavyUsersStream._

  test("mgUpdate: counters bounded by k, decrement-all evicts zeros") {
    val m = scala.collection.mutable.LinkedHashMap.empty[Long, Long]
    (1L to 3L).foreach(u => mgUpdate(m, u, 3))
    assert(m === scala.collection.mutable.LinkedHashMap(
      1L -> 1L, 2L -> 1L, 3L -> 1L))
    mgUpdate(m, 1L, 3) // existing key increments past the cap
    assert(m(1L) === 2L)
    mgUpdate(m, 9L, 3) // full + new key -> decrement-all, evict zeros
    assert(m === scala.collection.mutable.LinkedHashMap(1L -> 1L))
  }

  test("MG guarantee across micro-batches: a >n/(k+1) user is always " +
      "a candidate, state stays bounded") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TypedEvent]
    val q = heavyUsersStream(mem.toDS(), k = 3)
      .writeStream.format("memory").queryName("heavy_users")
      .outputMode("update").start()
    try {
      // batch 1: user 1 dominates type A (6 of 10 events)
      mem.addData(
        (Seq.fill(6)(1L) ++ Seq(2L, 3L, 4L, 5L)).map(TypedEvent("A", _)): _*)
      q.processAllAvailable()
      val b1 = spark.table("heavy_users").as[Candidate].collect()
      assert(b1.exists(c => c.event_type == "A" && c.user_id == 1L))
      assert(b1.count(_.event_type == "A") <= 3, "state must stay <= k")

      // batch 2: user 1 keeps dominating; a second type is independent
      mem.addData(
        (Seq.fill(4)(1L) ++ Seq(6L, 7L)).map(TypedEvent("A", _)) ++
          Seq.fill(3)(TypedEvent("B", 42L)): _*)
      q.processAllAvailable()
      val all = spark.table("heavy_users").as[Candidate].collect()
      val lastA = all.filter(_.event_type == "A")
      // user 1 has 10 of 16 type-A events (> 16/4): MUST survive, and
      // its lower bound can undercount by at most the decrements
      val u1 = lastA.filter(_.user_id == 1L).map(_.min_count).max
      assert(u1 >= 10L - 4L, s"lower bound too low: $u1")
      assert(all.filter(_.event_type == "B")
        .exists(c => c.user_id == 42L && c.min_count == 3L))
    } finally q.stop()
  }

  test("streaming candidates cover the exact batch top-1 per type") {
    implicit val sqlCtx = spark.sqlContext
    val events = (Seq.fill(5)(("A", 1L)) ++ Seq(("A", 2L), ("A", 3L)) ++
      Seq.fill(4)(("B", 9L)) ++ Seq(("B", 8L)))
    val mem = MemoryStream[TypedEvent]
    val q = heavyUsersStream(mem.toDS(), k = 3)
      .writeStream.format("memory").queryName("heavy_users_cover")
      .outputMode("update").start()
    try {
      mem.addData(events.map { case (t, u) => TypedEvent(t, u) }: _*)
      q.processAllAvailable()
      val cands = spark.table("heavy_users_cover").as[Candidate].collect()
        .map(c => (c.event_type, c.user_id)).toSet
      // exact twin over the same rows
      val ev = events.toDF("event_type", "user_id")
      val top1 = EventsStreaming.topUsersBatch(ev, k = 1)
        .select("event_type", "user_id").as[(String, Long)].collect()
      top1.foreach { t =>
        assert(cands.contains(t), s"dominant $t missing from candidates")
      }
    } finally q.stop()
  }
}

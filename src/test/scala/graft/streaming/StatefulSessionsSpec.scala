package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StatefulSessionsSpec extends SparkSpec {
  import spark.implicits._
  import StatefulSessions._

  test("state accumulates across micro-batches, thresholds tracked") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[UserEvent]
    val q = userTotalsStream(mem.toDS())
      .writeStream.format("memory").queryName("user_totals")
      .outputMode("update").start()
    try {
      mem.addData(UserEvent(7L, "buy", 600.0), UserEvent(7L, "buy", 300.0))
      q.processAllAvailable()
      val b1 = spark.table("user_totals").as[UserUpdate].collect()
        .filter(_.user_id == 7L).maxBy(_.n_events)
      assert(b1 === UserUpdate(7L, 2L, 90000L, 0L))

      mem.addData(UserEvent(7L, "buy", 250.0), UserEvent(8L, "buy", 10.0))
      q.processAllAvailable()
      val all = spark.table("user_totals").as[UserUpdate].collect()
      val u7 = all.filter(_.user_id == 7L).maxBy(_.n_events)
      assert(u7 === UserUpdate(7L, 3L, 115000L, 1L)) // crossed 1000 once
      assert(all.exists(_ == UserUpdate(8L, 1L, 1000L, 0L)))
    } finally q.stop()
  }
}

package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class RateMonitorStreamSpec extends SparkSpec {
  import spark.implicits._
  import RateMonitorStream._

  test("ewmaPrev: dyadic weights, normalization, empty history") {
    assert(ewmaPrev(Nil).isEmpty)
    assert(ewmaPrev(Seq(4L)) === Some(4.0))
    // most recent first: (4*0.5 + 8*0.25) / 0.75 = 16/3
    assert(ewmaPrev(Seq(4L, 8L)) === Some((4.0 * 0.5 + 8.0 * 0.25) / 0.75))
  }

  test("rateMonitorBatch: lag-window baseline, spike at 2x, first minute " +
      "NULL baseline") {
    val ev = (Seq.fill(4)(6000L) ++ Seq.fill(4)(6060L) ++
        Seq.fill(16)(6120L)).zipWithIndex
      .map { case (sec, i) =>
        (i.toLong, 1L, "view", 1.0, "{}",
          new java.sql.Timestamp(sec * 1000L)) }
      .toDF("event_id", "user_id", "event_type", "value", "props", "ts")
    val r = EventsStreaming.rateMonitorBatch(ev).collect()
      .map(x => x.getAs[Long]("minute") ->
        ((x.getAs[Long]("n_events"), x.getAs[java.lang.Double]("ewma_prev"),
          x.getAs[Boolean]("is_spike")))).toMap
    assert(r(100L) === ((4L, null, false)))
    assert(r(101L) === ((4L, java.lang.Double.valueOf(4.0), false)))
    // prior [4, 4] -> (4*0.5 + 4*0.25)/0.75 = 4; 16 > 8 -> spike
    assert(r(102L) === ((16L, java.lang.Double.valueOf(4.0), true)))
  }

  test("streaming arm: converges to the batch scores across " +
      "micro-batches, cross-batch minutes merge, state stays bounded") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[MinuteEvent]
    val q = rateMonitorStream(mem.toDS())
      .writeStream.format("memory").queryName("rate_monitor")
      .outputMode("update").start()
    try {
      mem.addData(Seq.fill(4)(MinuteEvent("A", 100L)): _*)
      q.processAllAvailable()
      mem.addData(Seq.fill(4)(MinuteEvent("A", 101L)): _*)
      q.processAllAvailable()
      mem.addData(Seq.fill(16)(MinuteEvent("A", 102L)): _*)
      q.processAllAvailable()
      val afterSpike = spark.table("rate_monitor").as[RateAlert].collect()
      val m102 = afterSpike.filter(a => a.minute == 102L).last
      assert(m102.n_events === 16L)
      assert(m102.ewma_prev === Some(4.0))
      assert(m102.is_spike)
      val m101 = afterSpike.filter(a => a.minute == 101L).last
      assert(m101.ewma_prev === Some(4.0) && !m101.is_spike)
      // the same minute continuing in a later batch merges its count
      mem.addData(Seq.fill(2)(MinuteEvent("A", 102L)): _*)
      q.processAllAvailable()
      val merged = spark.table("rate_monitor").as[RateAlert].collect()
        .filter(_.minute == 102L).last
      assert(merged.n_events === 18L)
      assert(merged.ewma_prev === Some(4.0) && merged.is_spike)
    } finally q.stop()
  }
}

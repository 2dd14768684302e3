package graft.etl

import graft.SparkSpec

class ScalarSurfaceSpec extends SparkSpec {
  import spark.implicits._

  private def ord(rows: (Long, String)*) =
    rows.map { case (k, d) => (k, 1L, "F", 100.0, ts(d + " 00:00:00"),
      "1-URGENT") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")

  test("orderDateParts: add_months clamps to month end") {
    val r = ScalarSurface.orderDateParts(ord(1L -> "2026-11-30"))
      .collect().head
    assert(r.getAs[String]("plus3m") === "2027-02-28") // clamped
    assert(r.getAs[String]("month_start") === "2026-11-01")
    assert(r.getAs[String]("month_end") === "2026-11-30")
    assert(r.getAs[Long]("qtr") === 4L)
    assert(r.getAs[Long]("month_index") === 2026L * 12 + 11)
  }

  test("orderDateParts: dow0 uses the 0=Sunday convention") {
    // 2026-08-09 is a Sunday
    val r = ScalarSurface.orderDateParts(ord(1L -> "2026-08-09"))
      .collect().head
    assert(r.getAs[Long]("dow0") === 0L)
    assert(r.getAs[Long]("epoch_s") % 86400 === 0L) // midnight UTC
  }

  test("eventsJsonProps: string, map and struct paths agree") {
    val ev = Seq(
      (1L, ts("2026-01-01 00:00:00"), 1L, "click", 1.0, """{"k": 87}"""),
      (2L, ts("2026-01-01 00:00:00"), 1L, "view", 1.0, """{"k": 0}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = ScalarSurface.eventsJsonProps(ev)
      .orderBy("event_id").collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("k_json") === r.getAs[Long]("k_map"))
      assert(r.getAs[Long]("k_json") === r.getAs[Long]("k_struct"))
      assert(r.getAs[Long]("n_keys") === 1L)
    }
    assert(rows.map(_.getAs[Long]("k_json")).toSeq === Seq(87L, 0L))
    assert(rows.map(_.getAs[Long]("k_bucket")).toSeq === Seq(7L, 0L))
  }

  test("variant path (parse_json + variant_get) agrees with the string " +
      "path on every event") {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val str = ScalarSurface.eventsJsonProps(ev)
      .select("event_id", "k_json")
    val vnt = ScalarSurface.eventsVariantProps(ev)
      .select("event_id", "k_variant")
    val diff = str.join(vnt, "event_id")
      .filter(org.apache.spark.sql.functions.col("k_json") =!=
        org.apache.spark.sql.functions.col("k_variant"))
      .count()
    assert(diff === 0L)
    assert(vnt.count() > 0)
  }
}

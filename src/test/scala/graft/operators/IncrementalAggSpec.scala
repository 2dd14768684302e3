package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private def orders(rows: (Long, String, Double)*) =
    rows.map { case (k, d, p) =>
      (k, 1L, "O", p, ts(s"$d 00:00:00"), "1-URGENT")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")

  test("merge of partials == full recompute, including days on only " +
      "one side of the cutoff") {
    val df = orders(
      (1L, "1995-12-30", 10.01), (2L, "1995-12-30", 20.02),
      (3L, "1996-01-02", 5.55),  (4L, "1996-01-02", 4.45),
      (5L, "1995-06-01", 7.00))
    val got = IncrementalAgg.incrementalDailySales(df)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val full = IncrementalAgg.dailySalesPartial(df)
      .select(col("day").cast("string"), col("n_orders"), col("sales_cents"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(got.view.mapValues(v => (v._1, v._2)).toMap === full)
    assert(got("1995-12-30") === ((2L, 3003L, 3003.0 / 2)))
    assert(got("1996-01-02") === ((2L, 1000L, 500.0)))
    assert(got("1995-06-01") === ((1L, 700L, 700.0)))
  }

  test("incrementalJoin: four delta terms reproduce the from-scratch join") {
    // custkeys straddle the mod-50 split: 0 and 50 are customer-deltas,
    // 17 and 67 are order-deltas, 3 is pure history
    val cust = Seq((0L, "AUTO"), (17L, "BLDG"), (50L, "AUTO"),
      (67L, "MACH"), (3L, "BLDG"))
      .toDF("c_custkey", "c_mktsegment")
    val ords = Seq(
      (1L, 0L, "O", 1.0), (2L, 17L, "F", 2.0), (3L, 50L, "O", 4.0),
      (4L, 67L, "F", 8.0), (5L, 3L, "O", 16.0), (6L, 17L, "O", 32.0),
      (7L, 99L, "O", 64.0)) // no matching customer -> excluded
      .map { case (k, c, st, p) => (k, c, st, p, ts("1995-01-01 00:00:00"),
        "1-URGENT") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val got = IncrementalAgg.incrementalJoin(cust, ords)
      .select("c_mktsegment", "o_orderstatus", "n_orders", "sales_cents")
      .as[(String, String, Long, Long)].collect().toSet
    assert(got === Set(
      ("AUTO", "O", 2L, 500L),          // orders 1 + 3
      ("BLDG", "F", 1L, 200L),          // order 2
      ("BLDG", "O", 2L, 4800L),         // orders 5 + 6
      ("MACH", "F", 1L, 800L)))         // order 4
  }

  test("measures are mergeable: merging in two delta batches equals " +
      "merging in one") {
    val a = IncrementalAgg.dailySalesPartial(orders((1L, "1995-01-01", 1.0)))
    val b = IncrementalAgg.dailySalesPartial(orders((2L, "1995-01-01", 2.0)))
    val c = IncrementalAgg.dailySalesPartial(orders((3L, "1995-01-01", 4.0)))
    val oneShot = IncrementalAgg.merge(a, b.unionByName(c))
    val twoStep = IncrementalAgg.merge(IncrementalAgg.merge(a, b), c)
    assert(oneShot.collect().toSeq === twoStep.collect().toSeq)
    val r = twoStep.collect().head
    assert(r.getAs[Long]("n_orders") === 3L)
    assert(r.getAs[Long]("sales_cents") === 700L)
  }
}

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

package graft.etl

import graft.SparkSpec

class WindowOpsSpec extends SparkSpec {
  import spark.implicits._

  private def orders(rows: (Long, Long, Double, String)*) =
    rows.map { case (ok, ck, tp, d) =>
      (ok, ck, "O", tp, ts(s"$d 00:00:00"), "1-URGENT")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")

  test("ewma: geometric half-weights over order history, normalized") {
    val got = WindowOps.ewmaCustomerSpend(orders(
      (1L, 7L, 10.0, "1997-01-01"),
      (2L, 7L, 20.0, "1997-01-02"),
      (3L, 7L, 40.0, "1997-01-03")))
      .select("o_orderkey", "ewma_cents")
      .as[(Long, Double)].collect().toMap
    assert(got(1L) === 1000.0)
    assert(got(2L) === 2500.0 / 1.5)
    assert(got(3L) === (4000.0 + 0.5 * 2000 + 0.25 * 1000) / 1.75)
  }

  test("ewma truncates at depth k and customers are independent") {
    val ord = orders(
      (1L, 7L, 10.0, "1997-01-01"),
      (2L, 7L, 20.0, "1997-01-02"),
      (3L, 7L, 40.0, "1997-01-03"),
      (4L, 8L, 99.0, "1997-01-01"))
    val got = WindowOps.ewmaCustomerSpend(ord, k = 2)
      .select("o_orderkey", "ewma_cents")
      .as[(Long, Double)].collect().toMap
    // depth 2: order 3 sees only orders 3 and 2
    assert(got(3L) === (4000.0 + 0.5 * 2000) / 1.5)
    // other customer's history never leaks in
    assert(got(4L) === 9900.0)
  }
}

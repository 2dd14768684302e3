package graft.etl

import graft.SparkSpec

/** Gold aggregation semantics on tiny frames (FIXTURES.md §C): line-item
  * count semantics, window-before-group, conditional delay counting,
  * inner-join drop of orders with no items.
  */
class GoldSpec extends SparkSpec {
  import spark.implicits._

  private def li(rows: (Long, Long, Long, Double, Double, Double, String)*) =
    rows.map { case (ok, pk, sk, qty, price, tax, ship) =>
      (ok, pk, sk, 1, qty, price, 0.0, tax, "N", "O", ts(ship + " 00:00:00"))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")

  private def ord(rows: (Long, Long, String, String)*) =
    rows.map { case (ok, ck, st, d) =>
      (ok, ck, st, 100.0, ts(d + " 00:00:00"), "1-URGENT")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")

  test("dailySales: counts line items (not orders), exact cents, join drops") {
    val l = li((1L, 1L, 1L, 1.0, 10.10, 0.05, "1997-01-02"),
               (1L, 1L, 1L, 2.0, 20.20, 0.05, "1997-01-03"),
               (9L, 1L, 1L, 2.0, 99.0, 0.05, "1997-01-03")) // no parent order
    val o = ord((1L, 7L, "F", "1997-01-01"),
                (2L, 7L, "F", "1997-06-01"))                // no items
    val out = Gold.dailySalesStage(l, o).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[String]("order_date") === "1997-01-01")
    assert(r.getAs[Long]("total_items") === 2L)       // line items, order 2 dropped
    assert(r.getAs[Long]("total_sales_cents") === 3030L)
    assert(r.getAs[Double]("total_sales") === 30.30)
    assert(r.getAs[Double]("avg_price") === 30.30 / 2)
  }

  test("customerMetrics: window min/max before group, lifetime days") {
    val l = li((1L, 1L, 1L, 1.0, 10.0, 0.0, "1997-01-05"),
               (2L, 1L, 1L, 1.0, 30.0, 0.0, "1997-02-05"))
    val o = ord((1L, 7L, "F", "1997-01-01"), (2L, 7L, "F", "1997-01-11"))
    val c = Seq((7L, "Customer#7", 3, 10.0, "BUILDING"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val r = Gold.customerMetricsStage(l, o, c).collect().head
    assert(r.getAs[String]("first_purchase_date") === "1997-01-01")
    assert(r.getAs[String]("last_purchase_date") === "1997-01-11")
    assert(r.getAs[Long]("customer_lifetime_days") === 10L)
    assert(r.getAs[Long]("total_items") === 2L)
    assert(r.getAs[Long]("total_spent_cents") === 4000L)
  }

  test("deliveryPerformance: conditional count only over 30-day delays") {
    val l = li((1L, 1L, 1L, 1.0, 10.0, 0.0, "1997-01-10"),  // 9 days
               (1L, 1L, 1L, 1.0, 10.0, 0.0, "1997-03-01"),  // 59 days
               (2L, 1L, 1L, 1.0, 10.0, 0.0, "1997-01-01"))  // 0 days
    val o = ord((1L, 7L, "F", "1997-01-01"), (2L, 8L, "O", "1997-01-01"))
    val out = Gold.deliveryPerformanceStage(l, o).collect()
      .map(r => r.getAs[String]("o_orderstatus") ->
        (r.getAs[Long]("total_items"), r.getAs[Long]("delayed_items"),
          r.getAs[Double]("avg_delivery_delay"))).toMap
    assert(out("F") === ((2L, 1L, 34.0)))
    assert(out("O") === ((1L, 0L, 0.0)))
  }

  test("sellerPerformance: ship-delay day-sum aggregates per supplier") {
    val l = li((1L, 1L, 5L, 1.0, 10.0, 0.0, "1997-01-03"),
               (1L, 1L, 5L, 1.0, 20.0, 0.0, "1997-01-05"))
    val o = ord((1L, 7L, "F", "1997-01-01"))
    val s = Seq((5L, "Supplier#5", 9, 100.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    val r = Gold.sellerPerformanceStage(l, s, o).collect().head
    assert(r.getAs[Long]("ship_delay_days_sum") === 6L)
    assert(r.getAs[Double]("avg_shipping_delay_days") === 3.0)
    assert(r.getAs[Long]("total_sales_cents") === 3000L)
  }

  test("marginWaterfall: gross/discount/tax tiers as exact scaled ints") {
    // one line: price 100.00, disc 10%, tax 5%
    //   gross 10000c; disc_e4 = 10000*10 = 100000 (= $10.00)
    //   tax_e6 = 10000*90*5 = 4_500_000 (= $4.50 on the discounted base)
    val df = Seq((1L, 1, 50.0, 100.0, 0.10, 0.05, "A"))
      .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax", "l_returnflag")
    val r = Gold.marginWaterfall(df).collect().head
    assert(r.getAs[Long]("gross_cents") === 10000L)
    assert(r.getAs[Long]("disc_e4") === 100000L)
    assert(r.getAs[Long]("tax_e6") === 4500000L)
    assert(r.getAs[Double]("gross_usd") === 100.0)
    assert(r.getAs[Double]("discount_usd") === 10.0)
    assert(r.getAs[Double]("tax_usd") === 4.5)
  }

  test("regionNationShares: shares nest — nation within region, region " +
      "within total") {
    val orders = ord(
      (1L, 10L, "O", "1997-01-01"), (2L, 10L, "O", "1997-01-02"),
      (3L, 20L, "O", "1997-01-03"), (4L, 30L, "O", "1997-01-04"))
    val cust = Seq((10L, 0L), (20L, 1L), (30L, 2L))
      .toDF("c_custkey", "c_nationkey")
    val nat = Seq((0L, "ALPHA", 0L), (1L, "BETA", 0L), (2L, "GAMMA", 1L))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    // region 0: ALPHA 200 + BETA 100 = 300; region 1: GAMMA 100; total 400
    val q = Gold.regionNationShares(orders, cust, nat)
    val r = q
      .select("n_regionkey", "n_name", "rev_cents", "region_cents",
        "share_of_region", "region_share_of_total")
      .as[(Long, String, Long, Long, Double, Double)].collect().toSet
    assert(r === Set(
      (0L, "ALPHA", 20000L, 30000L, 2.0 / 3, 0.75),
      (0L, "BETA", 10000L, 30000L, 1.0 / 3, 0.75),
      (1L, "GAMMA", 10000L, 10000L, 1.0, 0.25)))
    // the nation side consults the exact-bytes advisor hook (r16 #3)
    assert(q.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"),
      "advisor-gated nation join must broadcast when under threshold")
  }
}

package graft.ext

import graft.SparkSpec

class RetailSpec extends SparkSpec {
  import spark.implicits._

  private def li(rows: (Long, Long, Double)*) =
    rows.map { case (ok, pk, p) => (ok, pk, p) }
      .toDF("l_orderkey", "l_partkey", "l_extendedprice")

  test("abcClassification: Pareto classes with exact integer boundaries") {
    // revenues: p1=800, p2=150, p3=40, p4=10 (total 1000)
    // cum: 800 (80% -> A, boundary inclusive), 950 (95% -> B, inclusive),
    //      990 (99% -> C), 1000 (C)
    val r = Retail.abcClassification(li(
      (1L, 1L, 500.0), (2L, 1L, 300.0),
      (3L, 2L, 150.0),
      (4L, 3L, 40.0),
      (5L, 4L, 10.0)))
      .select("l_partkey", "cum_cents", "abc_class")
      .as[(Long, Long, String)].collect().toSet
    assert(r === Set(
      (1L, 80000L, "A"), (2L, 95000L, "B"),
      (3L, 99000L, "C"), (4L, 100000L, "C")))
  }

  test("abcClassification: banded prefix decomposition equals a global " +
      "running sum across digit-band boundaries") {
    // revenues spanning several digit counts: 9, 10, 99, 100, 5000 cents
    val rows = Seq((1L, 10L, 0.09), (2L, 11L, 0.10), (3L, 12L, 0.99),
      (4L, 13L, 1.00), (5L, 14L, 50.00))
    val got = Retail.abcClassification(li(rows: _*))
      .select("l_partkey", "cum_cents").as[(Long, Long)].collect().toMap
    // global desc order: 5000, 100, 99, 10, 9
    assert(got === Map(14L -> 5000L, 13L -> 5100L, 12L -> 5199L,
      11L -> 5209L, 10L -> 5218L))
  }

  test("basketLift: pair supports, lift, min-support cut") {
    // orders: {1,2} x3, {1,3} x1 -> pair (1,2) support 3, (1,3) support 1
    val r = Retail.basketLift(li(
      (1L, 1L, 1.0), (1L, 2L, 1.0),
      (2L, 1L, 1.0), (2L, 2L, 1.0),
      (3L, 1L, 1.0), (3L, 2L, 1.0),
      (4L, 1L, 1.0), (4L, 3L, 1.0)), minSupport = 3, k = 10)
      .select("part_a", "part_b", "n_ab", "n_a", "n_b", "lift")
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    // lift(1,2) = 3*4 / (4*3) = 1.0
    assert(r.toSeq === Seq((1L, 2L, 3L, 4L, 3L, 1.0)))
  }

  test("basketLift: duplicate lineitems collapse; top-k cut is " +
      "deterministic on (support, pair)") {
    val rows =
      Seq((1L, 1L), (1L, 1L), (1L, 2L), (1L, 3L),
        (2L, 1L), (2L, 2L), (2L, 3L)).map { case (ok, pk) => (ok, pk, 1.0) }
    val r = Retail.basketLift(li(rows: _*), minSupport = 2, k = 2)
      .select("part_a", "part_b").as[(Long, Long)].collect()
    // all three pairs have support 2; k=2 keeps (1,2) and (1,3)
    assert(r.toSeq === Seq((1L, 2L), (1L, 3L)))
  }

  private def orders(rows: (Long, Long, Double, String)*) =
    rows.map { case (ok, ck, tp, d) =>
      (ok, ck, "O", tp, ts(s"$d 00:00:00"), "1-URGENT") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")

  test("rfmSegments: quartile scores and all four segment labels") {
    // as_of = 2020-02-01 (global max order date); every order is 10.00.
    // A: 1 recent order    -> r3 f1 -> recent
    // B: 4 old orders      -> r1 f4 -> at_risk
    // C: 2 mid-aged orders -> r2 f2 -> regular
    // D: 3 orders, last recent -> r3 f3 m3 -> champion
    val r = Retail.rfmSegments(orders(
      (1L, 10L, 10.0, "2020-02-01"),
      (2L, 20L, 10.0, "2020-01-01"), (3L, 20L, 10.0, "2020-01-02"),
      (4L, 20L, 10.0, "2020-01-03"), (5L, 20L, 10.0, "2020-01-04"),
      (6L, 30L, 10.0, "2020-01-10"), (7L, 30L, 10.0, "2020-01-11"),
      (8L, 40L, 10.0, "2020-01-20"), (9L, 40L, 10.0, "2020-01-21"),
      (10L, 40L, 10.0, "2020-02-01")))
      .select("o_custkey", "recency_days", "frequency", "monetary_cents",
        "r_score", "f_score", "m_score", "segment")
      .as[(Long, Long, Long, Long, Int, Int, Int, String)].collect().toSet
    assert(r === Set(
      (10L, 0L, 1L, 1000L, 3, 1, 1, "recent"),
      (20L, 28L, 4L, 4000L, 1, 4, 4, "at_risk"),
      (30L, 21L, 2L, 2000L, 2, 2, 2, "regular"),
      (40L, 0L, 3L, 3000L, 3, 3, 3, "champion")))
  }

  test("repeatIntervals: telescoped mean gap, max gap, single-order " +
      "customers excluded, same-day ties give zero gaps") {
    val r = Retail.repeatIntervals(orders(
      (1L, 1L, 10.0, "2020-01-01"), (2L, 1L, 10.0, "2020-01-05"),
      (3L, 1L, 10.0, "2020-01-06"),
      (4L, 2L, 10.0, "2020-03-01"),                 // single order: dropped
      (5L, 3L, 10.0, "2020-02-01"), (6L, 3L, 10.0, "2020-02-01")))
      .select("o_custkey", "n_orders", "span_days", "avg_gap_days",
        "max_gap_days")
      .as[(Long, Long, Long, Double, Long)].collect().toSet
    assert(r === Set(
      (1L, 3L, 5L, 2.5, 4L),
      (3L, 2L, 0L, 0.0, 0L)))
  }

  test("skylineParts: non-dominated set, same-price losers dropped, " +
      "exact (price,size) ties all survive") {
    // frontier: (100, 5), (200, 9) and its exact tie, (300, 12)
    // dominated: (150, 4) by (100,5); (200, 7) by same-price (200,9);
    //            (250, 9) by (200,9) [same size, dearer];
    //            (350, 12) by (300,12); (400, 1) by everything
    val r = Retail.skylineParts(Seq(
      (1L, 1.00, 5), (2L, 1.50, 4), (3L, 2.00, 9), (4L, 2.00, 9),
      (5L, 2.00, 7), (6L, 2.50, 9), (7L, 3.00, 12), (8L, 3.50, 12),
      (9L, 4.00, 1))
      .toDF("p_partkey", "p_retailprice", "p_size"))
      .select("p_partkey", "price_cents", "p_size")
      .as[(Long, Long, Int)].collect().toSet
    assert(r === Set((1L, 100L, 5), (3L, 200L, 9), (4L, 200L, 9),
      (7L, 300L, 12)))
  }

  test("lifecycleStates: first order is new, long gap reactivates, " +
      "monthly rollup counts orders and distinct customers") {
    val r = Retail.lifecycleStates(orders(
      (1L, 1L, 10.0, "2020-01-05"),   // new
      (2L, 1L, 10.0, "2020-02-01"),   // 27d gap: active
      (3L, 1L, 10.0, "2020-09-01"),   // 213d gap: reactivated
      (4L, 2L, 10.0, "2020-02-10")))  // new
      .select("month", "state", "n_orders", "n_customers")
      .as[(String, String, Long, Long)].collect().toSet
    assert(r === Set(
      ("2020-01", "new", 1L, 1L),
      ("2020-02", "active", 1L, 1L),
      ("2020-02", "new", 1L, 1L),
      ("2020-09", "reactivated", 1L, 1L)))
  }

  test("skylineParts plan: frontier applies via broadcast join; the " +
      "window runs on the price-level aggregate, not the fact table") {
    val d = (1L to 100L).map(i => (i, (i % 10).toDouble + 1, (i % 5).toInt))
      .toDF("p_partkey", "p_retailprice", "p_size")
    val plan = Retail.skylineParts(d).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    // exactly one Window operator, fed by the per-price HashAggregate
    assert(plan.split("Window").length - 1 === 1, plan)
  }

  test("unitValueIndex: fixed base-month basket, exact unit values, " +
      "new products never shift the index") {
    def row(pk: Long, price: Double, qty: Double, ship: String) =
      (1L, pk, 1L, 1, qty, price, 0.0, 0.0, "N", "O",
        java.sql.Timestamp.valueOf(s"$ship 00:00:00"))
    val d = Seq(
      row(1L, 100.0, 1.0, "2024-01-05"),       // base: uv 100
      row(1L, 220.0, 2.0, "2024-02-05"),       // Feb: uv 110 -> 1.1
      row(2L, 999.0, 1.0, "2024-02-06"))       // new part: excluded
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
    val r = Retail.unitValueIndex(d)
      .select("month", "rev_cents", "qty", "unit_value", "price_index")
      .as[(String, Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(r.toSeq === Seq(
      ("2024-01", 10000L, 1L, 10000.0, 1.0),
      ("2024-02", 22000L, 2L, 11000.0, 1.1)))
  }
}

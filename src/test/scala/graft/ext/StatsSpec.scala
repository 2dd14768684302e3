package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

class StatsSpec extends SparkSpec {
  import spark.implicits._

  private def orders(rows: (Long, Long, Double, String)*): DataFrame =
    rows.toDF("o_orderkey", "o_custkey", "o_totalprice", "d")
      .selectExpr("o_orderkey", "o_custkey", "o_totalprice",
        "CAST(d AS TIMESTAMP) AS o_orderdate")

  test("trendSegmentSpend: exact slope/intercept on a hand-built line") {
    // segment A: daily avg value 100, 110, 120 dollars on days 0,1,2
    // (x anchored at 1995-01-01) -> slope exactly 10, intercept 100
    val o = orders(
      (1L, 1L, 100.0, "1995-01-01 00:00:00"),
      (2L, 1L, 110.0, "1995-01-02 00:00:00"),
      (3L, 1L, 120.0, "1995-01-03 00:00:00"))
    val c = Seq((1L, "A")).toDF("c_custkey", "c_mktsegment")
    val r = Stats.trendSegmentSpend(o, c)
      .select("c_mktsegment", "n_days", "slope_num", "slope_den", "slope",
        "intercept")
      .as[(String, Long, Long, Long, Double, Double)].collect().toSeq
    // n=3, sx=3, sy=330, sxy=350, sxx=5 -> num=3*350-3*330=60, den=3*5-9=6
    assert(r === Seq(("A", 3L, 60L, 6L, 10.0, 100.0)))
  }

  test("trendSegmentSpend: same-day orders average before the regression") {
    // two orders on day 0 (mean 150 by integer division), one on day 1
    val o = orders(
      (1L, 1L, 100.0, "1995-01-01 00:00:00"),
      (2L, 1L, 201.0, "1995-01-01 00:00:00"),
      (3L, 1L, 170.0, "1995-01-02 00:00:00"))
    val c = Seq((1L, "B")).toDF("c_custkey", "c_mktsegment")
    val r = Stats.trendSegmentSpend(o, c)
      .select("n_days", "sy", "slope").as[(Long, Long, Double)].collect()
    // y(0) = 30100 cents div 200 = 150 (floor), y(1) = 170
    assert(r === Array((2L, 320L, 20.0)))
  }

  test("corrQtyValue: r = 1 on a perfectly correlated pair, -1 inverted") {
    val li = Seq(
      // flag P: (qty, value) rises together day by day -> r = 1
      ("P", "1995-01-01 00:00:00", 1.0, 10.0),
      ("P", "1995-01-02 00:00:00", 2.0, 20.0),
      ("P", "1995-01-03 00:00:00", 3.0, 30.0),
      // flag N: value falls as qty rises -> r = -1
      ("N", "1995-01-01 00:00:00", 1.0, 30.0),
      ("N", "1995-01-02 00:00:00", 2.0, 20.0),
      ("N", "1995-01-03 00:00:00", 3.0, 10.0))
      .toDF("l_returnflag", "d", "l_quantity", "l_extendedprice")
      .selectExpr("l_returnflag", "CAST(d AS TIMESTAMP) AS l_shipdate",
        "l_quantity", "l_extendedprice")
    val byFlag = Stats.corrQtyValue(li).select("l_returnflag", "r")
      .as[(String, Double)].collect().toMap
    // sqrt(den_x)*sqrt(den_y) can land 1 ulp off sqrt(den_x*den_y), so
    // |r| may exceed 1 by an ulp — determinism is engine-vs-engine
    // bit-equality (the oracle mirrors the expression tree), not
    // exactness vs the algebraic value
    assert(math.abs(byFlag("P") - 1.0) < 1e-12)
    assert(math.abs(byFlag("N") + 1.0) < 1e-12)
  }

  test("hhiRegionRevenue: monopoly -> 1.0, equal split -> 1/n") {
    val o = orders(
      (1L, 1L, 1000.0, "1995-01-01 00:00:00"), // nation 0, region R0
      (2L, 2L, 1000.0, "1995-01-01 00:00:00"), // nation 1, region R1
      (3L, 3L, 1000.0, "1995-01-01 00:00:00")) // nation 2, region R1
    val c = Seq((1L, 0), (2L, 1), (3L, 2)).toDF("c_custkey", "c_nationkey")
    val n = Seq((0, 0), (1, 1), (2, 1)).toDF("n_nationkey", "n_regionkey")
    val reg = Seq((0, "R0"), (1, "R1")).toDF("r_regionkey", "r_name")
    val m = Stats.hhiRegionRevenue(o, c, n, reg)
      .select("r_name", "n_members", "hhi_ppm2", "top_share_ppm", "hhi")
      .as[(String, Long, Long, Long, Double)].collect()
      .map(t => t._1 -> t).toMap
    // R0: one nation with share 10^6 ppm -> hhi_ppm2 = 10^12, hhi = 1.0
    assert(m("R0")._2 === 1L && m("R0")._3 === 1000000000000L &&
      m("R0")._5 === 1.0)
    // R1: two equal nations, 500000 ppm each -> hhi = 0.5
    assert(m("R1")._2 === 2L && m("R1")._3 === 500000000000L &&
      m("R1")._4 === 500000L && m("R1")._5 === 0.5)
  }

  test("autocorrDailyRevenue: shifted-identical series gives r ~= 1 at lag 1") {
    // daily revenue d * 100k$ on days 0..4 -> y = 1000*d in k$... actually
    // y = (d*100000*100) div 100000 = 100*d; lag-1 pairs are the linear
    // shift (x = z + 100), so Pearson r is exactly 1 up to the sqrt ulp
    val o = orders((0 to 4).map { d =>
      ((d + 1).toLong, 1L, 100000.0 * (d + 1),
        f"1995-01-0${d + 1} 00:00:00")
    }: _*)
    val r = Stats.autocorrDailyRevenue(o, lags = Seq(1, 7))
      .select("lag", "n_pairs", "r_num", "den_x", "den_z", "r")
      .as[(Int, Long, Long, Long, Long, Double)].collect().toSeq
    // only lag 1 has pairs (span is 5 days); shifted series => den_x =
    // den_z = r_num and r = 1
    assert(r.size === 1)
    val (lag, n, num, dx, dz, rr) = r.head
    assert(lag === 1 && n === 4L && num === dx && dx === dz)
    assert(math.abs(rr - 1.0) < 1e-12)
  }

  test("theilSenSegment: lower-median pairwise slope, deterministic rank") {
    // weeks 0,1,2 with y = 100, 130, 120 -> slopes 30, 10, -10; lower
    // median (rank (3+1) div 2 = 2 under slope order) is 10 from the
    // (w0, w2) pair: dy=20, dx=2
    val o = orders(
      (1L, 1L, 100.0, "1995-01-01 00:00:00"),
      (2L, 1L, 130.0, "1995-01-08 00:00:00"),
      (3L, 1L, 120.0, "1995-01-15 00:00:00"))
    val c = Seq((1L, "A")).toDF("c_custkey", "c_mktsegment")
    val r = Stats.theilSenSegment(o, c)
      .select("c_mktsegment", "n_pairs", "med_dy", "med_dx", "theil_slope")
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(r === Seq(("A", 3L, 20L, 2L, 10.0)))
  }

  test("mannKendallSegment: monotone series gives S = C(n,2), no ties") {
    // strictly rising daily values on days 0..4 -> every pair concordant:
    // S = 10, tie_term = 0, var_num = 5*4*15 = 300
    val o = orders((0 to 4).map { d =>
      ((d + 1).toLong, 1L, 100.0 + 10 * d, f"1995-01-0${d + 1} 00:00:00")
    }: _*)
    val c = Seq((1L, "A")).toDF("c_custkey", "c_mktsegment")
    val r = Stats.mannKendallSegment(o, c)
      .select("c_mktsegment", "n_days", "s_stat", "tie_term", "var_num", "z")
      .as[(String, Long, Long, Long, Long, Double)].collect().toSeq
    assert(r.map(t => (t._1, t._2, t._3, t._4, t._5)) ===
      Seq(("A", 5L, 10L, 0L, 300L)))
    // z = (S-1)/sqrt(300/18)
    assert(math.abs(r.head._6 - 9.0 / math.sqrt(300.0 / 18.0)) < 1e-12)
  }

  test("mannKendallSegment: tied days reduce the variance numerator") {
    // y = 100, 100, 120: pairs (0,1)=0, (0,2)=+1, (1,2)=+1 -> S = 2;
    // tie group of 2 at y=100 -> tie_term = 2*1*9 = 18,
    // var_num = 3*2*11 - 18 = 48
    val o = orders(
      (1L, 1L, 100.0, "1995-01-01 00:00:00"),
      (2L, 1L, 100.0, "1995-01-02 00:00:00"),
      (3L, 1L, 120.0, "1995-01-03 00:00:00"))
    val c = Seq((1L, "A")).toDF("c_custkey", "c_mktsegment")
    val r = Stats.mannKendallSegment(o, c)
      .select("s_stat", "tie_term", "var_num")
      .as[(Long, Long, Long)].collect().toSeq
    assert(r === Seq((2L, 18L, 48L)))
  }

  test("spearmanQtyValue: rho = 1 on concordant ranks, -1 on inverted") {
    val li = Seq(
      // P: value rises with qty -> identical ranks, d2 = 0, rho = 1
      ("P", "1995-01-01 00:00:00", 1.0, 10.0),
      ("P", "1995-01-02 00:00:00", 2.0, 20.0),
      ("P", "1995-01-03 00:00:00", 3.0, 30.0),
      // N: value falls as qty rises -> ranks reversed, d2 = 8, rho = -1
      ("N", "1995-01-01 00:00:00", 1.0, 30.0),
      ("N", "1995-01-02 00:00:00", 2.0, 20.0),
      ("N", "1995-01-03 00:00:00", 3.0, 10.0))
      .toDF("l_returnflag", "d", "l_quantity", "l_extendedprice")
      .selectExpr("l_returnflag", "CAST(d AS TIMESTAMP) AS l_shipdate",
        "l_quantity", "l_extendedprice")
    val r = Stats.spearmanQtyValue(li)
      .select("l_returnflag", "n_days", "d2_sum", "rho")
      .as[(String, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(r === Seq(("N", 3L, 8L, -1.0), ("P", 3L, 0L, 1.0)))
  }

  test("ksEventValues: disjoint samples reach D = 1, identical reach 0") {
    def ev(rows: (String, Double)*) =
      rows.zipWithIndex.map { case ((t, v), i) => (i.toLong, t, v) }
        .toDF("event_id", "event_type", "value")
    // A = {1, 2} entirely below B = {5, 6}: at vc=200 cum_a=2, cum_b=0
    // -> d_num = |2*2 - 2*0| = 4 = n_a*n_b -> d_stat = 1.0
    val disjoint = Stats.ksEventValues(
      ev(("click", 1.0), ("click", 2.0), ("purchase", 5.0),
        ("purchase", 6.0)))
      .select("n_a", "n_b", "d_num", "d_stat", "reject_05")
      .as[(Long, Long, Long, Double, Int)].collect().toSeq
    // crit_05 = 1.358 * sqrt(4/4) = 1.358 > 1.0 -> cannot reject at n=2
    assert(disjoint === Seq((2L, 2L, 4L, 1.0, 0)))
    val same = Stats.ksEventValues(
      ev(("click", 1.0), ("purchase", 1.0), ("click", 3.5),
        ("purchase", 3.5)))
      .select("d_num", "d_stat").as[(Long, Double)].collect().toSeq
    assert(same === Seq((0L, 0.0)))
  }

  test("dailyValueDrift: interval-endpoint candidates recover the exact " +
      "sup distance per day") {
    // day 1 holds {1, 2}, day 2 holds {5, 6}; global = all four values.
    // F_day1 is 1 from x=2 while F_g(2) = 1/2 -> D = 0.5 (and symmetric
    // for day 2, attained as a LEFT-limit candidate before its first
    // point) -> d_num = 4 on the n_day*n_tot = 8 denominator
    val ev = Seq(
      ("1995-01-01 10:00:00", 1.0), ("1995-01-01 11:00:00", 2.0),
      ("1995-01-02 10:00:00", 5.0), ("1995-01-02 11:00:00", 6.0))
      .toDF("t", "value")
      .selectExpr("CAST(t AS TIMESTAMP) AS ts", "value")
    val r = Stats.dailyValueDrift(ev)
      .select("day", "n_day", "n_tot", "d_num", "d_stat")
      .as[(String, Long, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(r === Seq(
      ("1995-01-01", 2L, 4L, 4L, 0.5),
      ("1995-01-02", 2L, 4L, 4L, 0.5)))
    // identical per-day distributions -> zero drift everywhere
    val same = Stats.dailyValueDrift(Seq(
      ("1995-01-01 10:00:00", 1.0), ("1995-01-01 11:00:00", 2.0),
      ("1995-01-02 10:00:00", 1.0), ("1995-01-02 11:00:00", 2.0))
      .toDF("t", "value")
      .selectExpr("CAST(t AS TIMESTAMP) AS ts", "value"))
      .select("d_num").as[Long].collect().toSeq
    assert(same === Seq(0L, 0L))
  }

  test("changepointDailyRevenue: finds the level shift exactly") {
    // $1 on days 0..3, $2 on days 4..7 -> best split after day 3:
    // s1 = 400 cents over n1 = 4, s2 = 800 over n2 = 4
    val o = orders((0 until 8).map { i =>
      (i.toLong + 1, 1L, if (i < 4) 1.0 else 2.0,
        f"1995-01-${i + 1}%02d 00:00:00")
    }: _*)
    val r = Stats.changepointDailyRevenue(o)
      .select("split_day", "n1", "n2", "s1", "s2", "score",
        "mean_left", "mean_right")
      .as[(Long, Long, Long, Long, Long, Double, Double, Double)]
      .collect().toSeq
    val score = 400.0 * 400.0 / 4.0 + 800.0 * 800.0 / 4.0
    assert(r === Seq((3L, 4L, 4L, 400L, 800L, score, 1.0, 2.0)))
  }

  test("benfordOrderTotals: digit extraction and exact shares") {
    val o = orders(
      (1L, 1L, 1013.7, "1995-01-01 00:00:00"),
      (2L, 1L, 19.99, "1995-01-01 00:00:00"),
      (3L, 1L, 950.0, "1995-01-01 00:00:00"),
      (4L, 1L, 101.0, "1995-01-01 00:00:00"))
    val r = Stats.benfordOrderTotals(o)
      .select("digit", "n_orders", "share")
      .as[(String, Long, Double)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(r("1") === ((3L, 0.75)) && r("9") === ((1L, 0.25)))
  }

  test("poissonBootstrap: hand-computed draw, arm domain, partition " +
      "invariance") {
    // o_orderkey=1, arm=0: key=16, h = 16*2654435761 mod 2^32
    //   = 3816266512, which falls in [t1, t2) -> draw 2
    val one = Seq((1L, 10.0)).toDF("o_orderkey", "o_totalprice")
    val r1 = Stats.poissonBootstrap(one)
      .filter($"arm" === 0L).collect().head
    assert(r1.getAs[Long]("n_draws") === 2L)
    assert(r1.getAs[Long]("draw_cents") === 2000L)
    assert(r1.getAs[Double]("mean_cents") === 1000.0)

    val orders = Seq.tabulate(200)(i => ((i + 1).toLong, (i + 1) * 1.5))
      .toDF("o_orderkey", "o_totalprice")
    def run(df: DataFrame) = Stats.poissonBootstrap(df).collect()
      .map(r => (r.getAs[Long]("arm"), r.getAs[Long]("n_draws"),
        r.getAs[Long]("draw_cents"))).toSet
    val a = run(orders)
    assert(a.map(_._1) === (0L until 16L).toSet)
    // Poisson(1) multiplicities: total draws concentrate around n per arm
    val totalDraws = a.toSeq.map(_._2).sum
    assert(math.abs(totalDraws - 16L * 200L) < 16L * 200L / 5,
      s"total draws $totalDraws far from ${16 * 200}")
    assert(run(orders.repartition(13)) === a)
  }

  test("poissonBootstrap: fixture arm means bracket the true mean") {
    val orders = graft.Tables.orders(spark, "/root/testdata/sf0.001")
    val truth = orders
      .selectExpr("cast(sum(cast(round(o_totalprice * 100) as long)) as double)" +
        " / count(*) as m").collect().head.getDouble(0)
    val means = Stats.poissonBootstrap(orders).collect()
      .map(_.getAs[Double]("mean_cents"))
    assert(means.length === Stats.BootstrapArms)
    means.foreach(m => assert(math.abs(m - truth) / truth < 0.05,
      s"arm mean $m vs truth $truth"))
    // a real bootstrap has spread: not all arms identical
    assert(means.distinct.length > 1)
  }

  test("welchTOrderValues: hand-computed moments, t and Welch df") {
    // a: 10, 20, 30 dollars -> n 3, s 60, ss 1400, mean 20, var 100
    // b: 40, 50            -> n 2, s 90, ss 4100, mean 45, var 50
    val o = Seq(
      ("1-URGENT", 10.0), ("1-URGENT", 20.0), ("1-URGENT", 30.0),
      ("5-LOW", 40.0), ("5-LOW", 50.0),
      ("3-MEDIUM", 999.0) // excluded cohort must not leak in
    ).toDF("o_orderpriority", "o_totalprice")
    val r = Stats.welchTOrderValues(o).collect().head
    assert(r.getAs[Long]("n_a") === 3L)
    assert(r.getAs[Long]("n_b") === 2L)
    assert(r.getAs[Long]("s_a") === 60L)
    assert(r.getAs[Long]("ss_a") === 1400L)
    assert(r.getAs[Long]("s_b") === 90L)
    assert(r.getAs[Long]("ss_b") === 4100L)
    assert(r.getAs[Double]("mean_a") === 20.0)
    assert(r.getAs[Double]("var_a") === 100.0)
    assert(r.getAs[Double]("var_b") === 50.0)
    // se2_a = 100/3, se2_b = 25; t = -25 / sqrt(175/3); df ~ 2.8824
    val t = r.getAs[Double]("t_stat")
    assert(math.abs(t - (-25.0 / math.sqrt(100.0 / 3 + 25.0))) < 1e-12)
    assert(math.abs(r.getAs[Double]("df_welch") - 2.882352941176471) < 1e-9)
  }

  test("anovaOrderValues: hand-computed 5-group moments, SST/SSW/SSB and F") {
    // cohort moments (whole dollars):
    //   1-URGENT:        10,20,30 -> n 3, s  60, ss  1400, w = 1400-1200 = 200
    //   2-HIGH:          40,50    -> n 2, s  90, ss  4100, w = 4100-4050 =  50
    //   3-MEDIUM:        60       -> n 1, s  60, ss  3600, w = 0
    //   4-NOT SPECIFIED: 70,80    -> n 2, s 150, ss 11300, w = 11300-11250 = 50
    //   5-LOW:           90       -> n 1, s  90, ss  8100, w = 0
    // N 9, Σx 450, Σx² 28500, grand mean 50
    // SST = 28500 - 450·50 = 6000; SSW = 300; SSB = 5700
    // F = (5700/4) / (300/4) = 19 exactly
    val o = Seq(
      ("1-URGENT", 10.0), ("1-URGENT", 20.0), ("1-URGENT", 30.0),
      ("2-HIGH", 40.0), ("2-HIGH", 50.0),
      ("3-MEDIUM", 60.0),
      ("4-NOT SPECIFIED", 70.0), ("4-NOT SPECIFIED", 80.0),
      ("5-LOW", 90.0),
      ("9-BOGUS", 999.0) // outside the priority domain: must not leak in
    ).toDF("o_orderpriority", "o_totalprice")
    val r = Stats.anovaOrderValues(o).collect().head
    assert(r.getAs[Long]("n_tot") === 9L)
    assert(r.getAs[Long]("df1") === 4L)
    assert(r.getAs[Long]("df2") === 4L)
    assert(r.getAs[Double]("sst") === 6000.0)
    assert(r.getAs[Double]("ssw") === 300.0)
    assert(r.getAs[Double]("ssb") === 5700.0)
    assert(r.getAs[Double]("f_stat") === 19.0)
  }

  test("anovaOrderValues: fixture run — one row, all cohorts populated, " +
      "SST = SSW + SSB, F positive") {
    val orders = graft.Tables.orders(spark, "/root/testdata/sf0.001")
    val r = Stats.anovaOrderValues(orders).collect().head
    assert(r.getAs[Long]("n_tot") > 0L)
    assert(r.getAs[Long]("df2") === r.getAs[Long]("n_tot") - 5L)
    val (sst, ssw, ssb) = (r.getAs[Double]("sst"), r.getAs[Double]("ssw"),
      r.getAs[Double]("ssb"))
    assert(math.abs(sst - (ssw + ssb)) <= 1e-9 * sst)
    assert(ssw > 0 && r.getAs[Double]("f_stat") > 0)
  }

  test("welchTOrderValues: fixture run — one row, both cohorts populated," +
      " df between min(n)-1 and n_a+n_b-2") {
    val orders = graft.Tables.orders(spark, "/root/testdata/sf0.001")
    val r = Stats.welchTOrderValues(orders).collect().head
    val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
    assert(na > 0 && nb > 0)
    val df = r.getAs[Double]("df_welch")
    assert(df >= math.min(na, nb) - 1.0 && df <= na + nb - 2.0,
      s"Welch df $df outside [min(n)-1, n_a+n_b-2]")
    assert(!r.getAs[Double]("t_stat").isNaN)
  }
  test("olsSegment: exact slope/intercept/R2 on a hand-built weekly " +
      "line; single-week groups pin to zero; noise shows in R2") {
    val cust = Seq((1L, "A"), (2L, "B"), (3L, "C"))
      .toDF("c_custkey", "c_mktsegment")
    val o = orders(
      // A: y = 10 + 5w over weeks 0..2 -> slope 5, intercept 10, R2 1
      (1L, 1L, 10.0, "1995-01-01 00:00:00"),
      (2L, 1L, 15.0, "1995-01-08 00:00:00"),
      (3L, 1L, 20.0, "1995-01-15 00:00:00"),
      // B: one week only -> den 0 -> slope 0, intercept = y, R2 0
      (4L, 2L, 7.0, "1995-01-01 00:00:00"),
      // C: y = [10, 10, 40] -> slope 15, intercept 5, R2 0.75
      (5L, 3L, 10.0, "1995-01-01 00:00:00"),
      (6L, 3L, 10.0, "1995-01-08 00:00:00"),
      (7L, 3L, 40.0, "1995-01-15 00:00:00"))
    val r = Stats.olsSegment(o, cust)
      .select("c_mktsegment", "n_weeks", "slope", "intercept", "r2")
      .as[(String, Long, Double, Double, Double)]
      .collect().map(x => x._1 -> x).toMap
    assert(r("A") === (("A", 3L, 5.0, 10.0, 1.0)))
    assert(r("B") === (("B", 1L, 0.0, 7.0, 0.0)))
    assert(r("C")._2 === 3L && r("C")._3 === 15.0 && r("C")._4 === 5.0)
    assert(r("C")._5 === 0.75)
  }
  test("pacfDailyRevenue: matches an independent ACF + Durbin-Levinson " +
      "replay; lag-1 PACF equals lag-1 ACF") {
    // 14 consecutive days, daily revenue k$ = ys(i) (prices in $1000s
    // so y = rev_cents div 100000 lands exactly on the series)
    val ys = Seq(1L, 5L, 2L, 8L, 3L, 9L, 4L, 7L, 6L, 2L, 9L, 1L, 5L, 4L)
    val o = orders(ys.zipWithIndex.map { case (y, i) =>
      ((i + 1).toLong, 1L, y * 1000.0,
        java.time.LocalDate.of(1995, 3, 1).plusDays(i).toString)
    }: _*)
    val maxLag = 4
    val got = Stats.pacfDailyRevenue(o, maxLag).collect()
      .map(r => r.getAs[Long]("lag") ->
        ((r.getAs[Double]("rho"), r.getAs[Double]("pacf")))).toMap

    // ---- reference replay from definitions
    val n = ys.length
    val sSum = ys.sum
    def num(k: Int): BigDecimal = {
      val pairs = (0 until n - k).map(t => (ys(t), ys(t + k)))
      val ak = pairs.map { case (a, b) => BigDecimal(a) * BigDecimal(b) }.sum
      val hk = BigDecimal(pairs.map(_._1).sum)
      val tk = BigDecimal(pairs.map(_._2).sum)
      BigDecimal(n) * BigDecimal(n) * ak -
        BigDecimal(n) * BigDecimal(sSum) * (hk + tk) +
        BigDecimal(pairs.length) * BigDecimal(sSum) * BigDecimal(sSum)
    }
    val rho = Array.tabulate(maxLag + 1)(k =>
      if (k == 0) 1.0 else num(k).toDouble / num(0).toDouble)
    val phi = Array.ofDim[Double](maxLag + 1, maxLag + 1)
    phi(1)(1) = rho(1)
    for (k <- 2 to maxLag) {
      var nv = rho(k); var j = 1
      while (j < k) { nv -= phi(k - 1)(j) * rho(k - j); j += 1 }
      var dv = 1.0; j = 1
      while (j < k) { dv -= phi(k - 1)(j) * rho(j); j += 1 }
      phi(k)(k) = nv / dv
      j = 1
      while (j < k) {
        phi(k)(j) = phi(k - 1)(j) - phi(k)(k) * phi(k - 1)(k - j); j += 1
      }
    }
    (1 to maxLag).foreach { k =>
      assert(got(k.toLong)._1 === rho(k), s"rho($k)")
      assert(math.abs(got(k.toLong)._2 - phi(k)(k)) < 1e-12, s"pacf($k)")
    }
    assert(got(1L)._2 === got(1L)._1) // PACF(1) == ACF(1) by definition
  }
  test("rollingCorrDaily: perfect linearity gives r = 1, anti gives -1, " +
      "constant metric surfaces NULL") {
    // days 0..3, one window of 3: counts x = [1,2,3,...]; revenue k$
    // proportional to count -> r = 1 in every full window
    def mk(ys: Seq[(Int, Long)]) = orders(
      ys.zipWithIndex.flatMap { case ((cnt, k), i) =>
        (1 to cnt).map(j => ((i * 10 + j).toLong, 1L, k * 1000.0 / cnt,
          java.time.LocalDate.of(1995, 3, 1).plusDays(i).toString))
      }: _*)
    // x = [1, 2, 3, 4]; z = x exactly (k$ = count)
    val lin = mk(Seq((1, 1L), (2, 2L), (3, 3L), (4, 4L)))
    val r1 = Stats.rollingCorrDaily(lin, window = 3).collect()
      .filter(_.getAs[Long]("n_w") >= 2L) // single-point window has var 0
      .map(_.getAs[java.lang.Double]("r"))
    assert(r1.nonEmpty && r1.forall(v =>
      v != null && math.abs(v - 1.0) < 1e-12))
    // z descends while x ascends -> r = -1 on full windows
    val anti = mk(Seq((1, 4L), (2, 3L), (3, 2L), (4, 1L)))
    val r2 = Stats.rollingCorrDaily(anti, window = 3).collect()
      .filter(_.getAs[Long]("n_w") === 3L)
      .map(_.getAs[java.lang.Double]("r"))
    assert(r2.nonEmpty && r2.forall(v => math.abs(v + 1.0) < 1e-12))
    // constant revenue -> den_z = 0 -> NULL, not a crash
    val const = mk(Seq((1, 5L), (2, 5L), (3, 5L)))
    val r3 = Stats.rollingCorrDaily(const, window = 3).collect()
    assert(r3.forall(_.isNullAt(2)))
  }

  private def permEvents(rows: (Long, Double)*): DataFrame =
    rows.zipWithIndex.map { case ((uid, v), i) =>
      (i.toLong, uid, "view", v, "{}",
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    }.toDF("event_id", "user_id", "event_type", "value", "props", "ts")

  private def typedEvents(rows: (Long, String, Double)*): DataFrame =
    rows.zipWithIndex.map { case ((uid, et, v), i) =>
      (i.toLong, uid, et, v, "{}",
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    }.toDF("event_id", "user_id", "event_type", "value", "props", "ts")

  test("permutationTest: constant metric pins every delta to 0 and " +
      "p to 1") {
    // every user spends the same -> any relabeling gives delta 0,
    // |0| >= |0| on all replicates
    val ev = permEvents((0L to 9L).map(u => (u, 1.0)): _*)
    val r = Stats.permutationTest(ev, reps = 8)
      .select("rep", "delta", "obs_delta", "p_value")
      .as[(Long, Option[Double], Option[Double], Double)].collect()
    assert(r.length === 8)
    assert(r.forall(x => x._2.contains(0.0) && x._3.contains(0.0)))
    assert(r.forall(_._4 === 1.0))
  }

  test("bhFdrSegments: strong segment rejected, null segment kept, " +
      "one-arm segment stands outside the family") {
    val big = (0L until 30L).map(u =>
      (u, "big", if (u % 2 == 0) 10.0 else 0.0))
    val nul = (100L until 120L).map(u => (u, "null", 5.0))
    val degen = (200L to 210L by 2).map(u => (u, "degen", 3.0))
    val r = Stats.bhFdrSegments(typedEvents(big ++ nul ++ degen: _*))
      .select("event_type", "n_exceed", "p_value", "rank", "m", "rejected")
      .as[(String, Option[Long], Option[Double], Option[Long], Long,
        Long)]
      .collect().map(x => x._1 -> x).toMap
    assert(r.values.forall(_._5 === 2L)) // degen outside the family
    val d = r("degen")
    assert(d._2.isEmpty && d._3.isEmpty && d._4.isEmpty && d._6 === 0L)
    val n = r("null")
    assert(n._3.contains(1.0) && n._6 === 0L) // |0| >= |0| everywhere
    val b = r("big")
    assert(b._4.contains(1L) && b._6 === 1L,
      s"strong effect must rank first and be rejected: $b")
    // BH threshold replay: reject iff (c+1)*m*10 <= rank*(R+1)
    assert(b._2.exists(c => (c + 1) * 2 * 10 <= 1 * 65))
  }

  test("permutationTest: replicate sums and p match an independent " +
      "replay of the hash contract") {
    // strong parity effect: variant-0 users spend 10.00, variant-1 zero
    val users = (0L to 9L).map(u => (u, if (u % 2 == 0) 10.0 else 0.0))
    val reps = 8
    val r = Stats.permutationTest(permEvents(users: _*), reps = reps)
      .select("rep", "n0", "s0_cents", "delta", "obs_delta", "p_value")
      .as[(Long, Long, Long, Option[Double], Option[Double], Double)]
      .collect().sortBy(_._1)
    // independent replay (plain Scala, same published contract)
    def assign(u: Long, rep: Long): Long =
      if ((((u * reps + rep) * 2654435761L) % 4294967296L) >= 2147483648L)
        1L
      else 0L
    val cents = users.map { case (u, v) => u -> math.round(v * 100) }
    val n = 10L
    val s = cents.map(_._2).sum
    val obs = {
      val z = cents.filter(_._1 % 2 == 0)
      z.map(_._2).sum.toDouble / z.size -
        (s - z.map(_._2).sum).toDouble / (n - z.size)
    }
    val expected = (0 until reps).map { rep =>
      val zero = cents.filter { case (u, _) => assign(u, rep.toLong) == 0L }
      val (rn0, rs0) = (zero.size.toLong, zero.map(_._2).sum)
      val delta =
        if (rn0 == 0L || rn0 == n) None
        else Some(rs0.toDouble / rn0 - (s - rs0).toDouble / (n - rn0))
      (rep.toLong, rn0, rs0, delta)
    }
    // Phipson & Smith: the observed labeling is one permutation
    val pExp = (expected.count(_._4.exists(d =>
      math.abs(d) >= math.abs(obs))) + 1).toDouble / (reps + 1)
    assert(r.map(x => (x._1, x._2, x._3, x._4)).toSeq === expected)
    assert(r.forall(x => x._5.contains(obs) && x._6 === pExp))
  }
}

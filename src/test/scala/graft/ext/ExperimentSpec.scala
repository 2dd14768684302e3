package graft.ext

import graft.SparkSpec

class ExperimentSpec extends SparkSpec {
  import spark.implicits._

  private def events(rows: (Long, Long, String)*) =
    rows.map { case (eid, uid, et) =>
      (eid, uid, et, 1.0, "{}", ts("2024-01-01 00:00:00")) }
      .toDF("event_id", "user_id", "event_type", "value", "props", "ts")

  test("wilsonAb: modulus assignment, distinct-user conversion, Wilson " +
      "interval endpoints") {
    // variant 0 = users {0, 2}: one converts  -> p = 0.5
    // variant 1 = users {1, 3}: both convert  -> p = 1.0, hi pinned at 1
    // repeated purchases by user 1 must not inflate n_converted
    val r = Experiment.wilsonAb(events(
      (1L, 0L, "purchase"), (2L, 0L, "click"),
      (3L, 2L, "view"),
      (4L, 1L, "purchase"), (5L, 1L, "purchase"),
      (6L, 3L, "purchase")))
      .select("variant", "n_users", "n_converted", "p_hat",
        "wilson_lo", "wilson_hi")
      .as[(Long, Long, Long, Double, Double, Double)]
      .collect().sortBy(_._1)
    assert(r.map(x => (x._1, x._2, x._3, x._4)).toSeq ===
      Seq((0L, 2L, 1L, 0.5), (1L, 2L, 2L, 1.0)))

    // independent reference arithmetic (plain formula, not the impl's
    // column DAG): Wilson bounds for (s, n) at z = 1.96
    def wilson(s: Int, n: Int): (Double, Double) = {
      val z = 1.96; val p = s.toDouble / n
      val d = 1 + z * z / n
      val c = p + z * z / (2 * n)
      val h = z * math.sqrt(p * (1 - p) / n + z * z / (4.0 * n * n))
      ((c - h) / d, (c + h) / d)
    }
    val (lo0, hi0) = wilson(1, 2)
    val (lo1, hi1) = wilson(2, 2)
    assert(math.abs(r(0)._5 - lo0) < 1e-12 && math.abs(r(0)._6 - hi0) < 1e-12)
    assert(math.abs(r(1)._5 - lo1) < 1e-12)
    assert(math.abs(r(1)._6 - 1.0) < 1e-12) // p=1 pins the upper bound
    // interval sanity: bounds bracket p̂ inside [0, 1]
    r.foreach { x =>
      assert(x._5 >= 0.0 && x._6 <= 1.0 + 1e-12 && x._5 < x._4 + 1e-12 &&
        x._4 < x._6 + 1e-12)
    }
  }

  test("mannWhitney: doubled tie-averaged ranks, exact U, symmetric z") {
    // variant 0 (users 0,2): values 1.00, 2.00
    // variant 1 (users 1,3): values 2.00, 3.00
    // pooled ranks: 1, 2.5, 2.5, 4 -> R0=3.5 (2x=7), R1=6.5 (2x=13)
    // U0 = 3.5 - 3 = 0.5 (2x=1); U1 = 3.5 (2x=7); U0+U1 = n0*n1 = 4
    val ev = Seq(
      (1L, 0L, 1.00), (2L, 2L, 2.00), (3L, 1L, 2.00), (4L, 3L, 3.00))
      .map { case (e, u, v) =>
        (e, u, "view", v, "{}", ts("2024-01-01 00:00:00")) }
      .toDF("event_id", "user_id", "event_type", "value", "props", "ts")
    val r = Experiment.mannWhitney(ev)
      .select("variant", "n", "rank_sum_2x", "u_2x", "z")
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(x => x._1 -> x).toMap
    assert((r(0L)._2, r(0L)._3, r(0L)._4) === ((2L, 7L, 1L)))
    assert((r(1L)._2, r(1L)._3, r(1L)._4) === ((2L, 13L, 7L)))
    // z = ((u2x - n0*n1)/2) / sqrt(n0*n1*(n+1)/12)
    val z0 = ((1.0 - 4.0) / 2) / math.sqrt(4.0 * 5 / 12)
    assert(math.abs(r(0L)._5 - z0) < 1e-12)
    assert(math.abs(r(0L)._5 + r(1L)._5) < 1e-15) // antisymmetric
  }

  private def cupedEvents(rows: (Long, Long, String, Double)*) =
    rows.zipWithIndex.map { case ((uid, _, day, v), i) =>
      (i.toLong, uid, "view", v, "{}", ts(s"$day 00:00:00")) }
      .toDF("event_id", "user_id", "event_type", "value", "props", "ts")

  test("cuped: hand-computed theta, rho2, and adjusted means") {
    // calendar 2024-01-01..04 -> split after Jan 2 (midpoint floor)
    // pooled x = [100,200,300,400] cents, y = [200,450,500,800]
    // cov_n = 4*580000 - 1000*1950 = 370000; varx_n = 200000
    // theta = 1.85; rho2 = 370000^2 / (200000*727500)
    val ev = cupedEvents(
      (0L, 0L, "2024-01-01", 1.00), (0L, 0L, "2024-01-03", 2.00),
      (2L, 0L, "2024-01-02", 3.00), (2L, 0L, "2024-01-04", 5.00),
      (1L, 1L, "2024-01-01", 2.00), (1L, 1L, "2024-01-03", 4.50),
      (3L, 1L, "2024-01-02", 4.00), (3L, 1L, "2024-01-04", 8.00))
    val r = Experiment.cuped(ev)
      .select("variant", "n_users", "mean_x", "mean_y", "theta", "rho2",
        "mean_y_adj")
      .as[(Long, Long, Double, Double, Double, Double, Double)]
      .collect().sortBy(_._1)
    assert(r.map(x => (x._1, x._2, x._3, x._4)).toSeq ===
      Seq((0L, 2L, 200.0, 350.0), (1L, 2L, 300.0, 625.0)))
    assert(math.abs(r(0)._5 - 1.85) < 1e-12)
    assert(math.abs(r(0)._6 - 370000.0 * 370000.0 /
      (200000.0 * 727500.0)) < 1e-12)
    // adj = mean_y - theta * (mean_x - 250)
    assert(math.abs(r(0)._7 - 442.5) < 1e-12)
    assert(math.abs(r(1)._7 - 532.5) < 1e-12)
    // the covariate explains most of the gap: |adj diff| < |raw diff|
    assert(math.abs(r(1)._7 - r(0)._7) < math.abs(r(1)._4 - r(0)._4))
  }

  test("cuped: perfectly linear Y = 2X equalizes arms and pins rho2 = 1") {
    val ev = cupedEvents(
      (0L, 0L, "2024-01-01", 1.00), (0L, 0L, "2024-01-03", 2.00),
      (2L, 0L, "2024-01-02", 3.00), (2L, 0L, "2024-01-04", 6.00),
      (1L, 1L, "2024-01-01", 2.00), (1L, 1L, "2024-01-03", 4.00),
      (3L, 1L, "2024-01-02", 4.00), (3L, 1L, "2024-01-04", 8.00))
    val r = Experiment.cuped(ev)
      .select("variant", "theta", "rho2", "mean_y_adj")
      .as[(Long, Double, Double, Double)].collect().sortBy(_._1)
    assert(math.abs(r(0)._2 - 2.0) < 1e-12)
    assert(math.abs(r(0)._3 - 1.0) < 1e-12)
    assert(math.abs(r(0)._4 - r(1)._4) < 1e-9) // arms agree post-adjust
  }

  test("cuped: zero pre-period variance pins theta and rho2 to 0") {
    // every user has x = 100 cents -> varx_n = 0; adjusted mean = raw mean
    val ev = cupedEvents(
      (0L, 0L, "2024-01-01", 1.00), (0L, 0L, "2024-01-03", 2.00),
      (1L, 1L, "2024-01-01", 1.00), (1L, 1L, "2024-01-03", 5.00))
    val r = Experiment.cuped(ev)
      .select("variant", "theta", "rho2", "mean_y", "mean_y_adj")
      .as[(Long, Double, Double, Double, Double)].collect().sortBy(_._1)
    r.foreach { x =>
      assert(x._2 === 0.0 && x._3 === 0.0)
      assert(x._4 === x._5)
    }
  }

  test("srm: balanced segment passes, one-sided segment flags; chi2 " +
      "matches the textbook two-cell formula") {
    // "view": users 0..9 -> 5 even / 5 odd, diff 0 -> chi2 0, no flag.
    // "click": users 0,2,..,18 (all even) -> n0=10, n1=0.
    //   textbook: E = 5; (10-5)^2/5 + (0-5)^2/5 = 10 -> flagged (>3.841).
    // repeated events by one user must not inflate the distinct counts.
    val view = (0L until 10L).map(u => (100L + u, u, "view"))
    val click = (0L until 10L).map(i => (200L + i, 2L * i, "click"))
    val r = Experiment.srm(events(view ++ click :+ (300L, 0L, "view"): _*))
      .select("event_type", "n0", "n1", "n", "chi2", "srm_flag")
      .as[(String, Long, Long, Long, Double, Long)]
      .collect().sortBy(_._1)
    assert(r.toSeq === Seq(
      ("click", 10L, 0L, 10L, 10.0, 1L),
      ("view", 5L, 5L, 10L, 0.0, 0L)))
  }

  test("mde: hand-computed variances and the 2.8016-sigma formula; " +
      "single-user arm pins outputs to NULL") {
    // variant 0 (users 0,2): spends 100, 300 cents -> var = 20000
    // variant 1 (users 1,3): spends 200, 200 cents -> var = 0
    val ev = events((1L, 0L, "a"), (2L, 2L, "a"), (3L, 1L, "a"),
      (4L, 3L, "a"))
      .drop("value")
      .withColumn("value",
        org.apache.spark.sql.functions.expr(
          "CASE user_id WHEN 0 THEN 1.0 WHEN 2 THEN 3.0 ELSE 2.0 END"))
    val r = Experiment.mde(ev)
      .select("n0", "n1", "var0", "var1", "mean_all", "mde_cents",
        "mde_rel")
      .as[(Long, Long, Double, Double, Double, Double, Double)]
      .collect()
    assert(r.length === 1)
    val x = r.head
    assert(x._1 === 2L && x._2 === 2L)
    assert(x._3 === 20000.0 && x._4 === 0.0)
    assert(x._5 === 200.0)
    val expMde = (1.96 + 0.8416) * math.sqrt(20000.0 / 2 + 0.0 / 2)
    assert(x._6 === expMde && x._7 === expMde / 200.0)

    // a 1-user arm cannot estimate variance -> NULLs
    val tiny = events((1L, 0L, "a"), (2L, 1L, "a"), (3L, 3L, "a"))
    val t = Experiment.mde(tiny)
      .select("var0", "mde_cents", "mde_rel")
      .as[(Option[Double], Option[Double], Option[Double])].collect().head
    assert(t._1.isEmpty && t._2.isEmpty && t._3.isEmpty)
  }

  test("srm: boundary sits at the exact 3.84146 critical value") {
    // "a": n = 1000, diff = 62 -> chi2 = 3.844 > 3.84146 (flag);
    // "b": diff = 60 -> chi2 = 3.6 (no flag);
    // "c": n = 4605, diff = 133 -> chi2 = 17689/4605 = 3.84125..., which
    //   sits INSIDE (3.841, 3.84146] — a truncated 3.841 constant would
    //   mis-flag it (1000*17689 > 3841*4605), the exact 5-dp value must
    //   not (100000*17689 = 1_768_900_000 <= 384146*4605 = 1_768_992_330).
    def seg(name: String, n0: Int, n1: Int) =
      (0 until n0).map(i => (1L, 2L * i, name)) ++
        (0 until n1).map(i => (1L, 2L * i + 1L, name))
    val r = Experiment.srm(events(
      seg("a", 531, 469) ++ seg("b", 530, 470) ++
        seg("c", 2369, 2236) map identity: _*))
      .select("event_type", "srm_flag").as[(String, Long)]
      .collect().sortBy(_._1)
    assert(r.toSeq === Seq(("a", 1L), ("b", 0L), ("c", 0L)))
  }

  test("mde: moment-domain guard raises loudly instead of silently " +
      "NULLing past the decimal(38,0) bound") {
    // one user spending 1e13 dollars -> cents 1e15, sxx = 1e30 + eps over
    // the cap once a second user pushes sxx past 1e30
    val big = events((1L, 0L, "a"), (2L, 2L, "a"), (3L, 1L, "a"),
      (4L, 3L, "a"))
      .drop("value")
      .withColumn("value",
        org.apache.spark.sql.functions.expr(
          "CASE WHEN user_id % 2 = 0 THEN 1e14 ELSE 2.0 END"))
    val e = intercept[Exception] {
      Experiment.mde(big).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("decimal(38,0) domain")),
      s"expected the domain guard, got: $e")
  }
}

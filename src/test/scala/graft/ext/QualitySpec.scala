package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("profile: zero-column frame returns an empty profile, not a " +
      "reduce-on-empty throw (r18 advice)") {
    val zero = spark.range(3).drop("id")
    val p = Quality.profile(zero)
    assert(p.columns.toSeq === Seq("column", "n_rows", "n_nulls",
      "n_distinct", "min_str", "max_str"))
    assert(p.count() === 0L)
  }

  test("fkAudit: planted orphan is counted; clean edge passes; " +
      "fixture FK graph is fully consistent") {
    val fact = Seq((1L, 10L), (2L, 10L), (3L, 99L))
      .toDF("id", "fk") // fk 99 has no dim partner
    val dim = Seq(Tuple1(10L), Tuple1(11L), Tuple1(10L)).toDF("pk")
    val bad = Quality.fkAudit(fact, "fk", dim, "pk", "fact.fk->dim.pk")
      .collect().head
    assert(bad.getAs[String]("fk_edge") === "fact.fk->dim.pk")
    assert(bad.getAs[Long]("n_rows") === 3L)
    assert(bad.getAs[Long]("n_orphans") === 1L)
    assert(!bad.getAs[Boolean]("ok"))
    val clean = Quality.fkAudit(fact.filter($"fk" === 10L), "fk", dim,
      "pk", "e").collect().head
    assert(clean.getAs[Long]("n_orphans") === 0L &&
      clean.getAs[Boolean]("ok"))
    // the driver fixtures keep every FK edge consistent
    val audit = Quality.referentialIntegrity(spark, "/root/testdata/sf0.001")
      .collect()
    assert(audit.length === Quality.FkEdges.length)
    audit.foreach { r =>
      assert(r.getAs[Boolean]("ok"),
        s"${r.getAs[String]("fk_edge")} has orphans")
      assert(r.getAs[Long]("n_rows") > 0L)
    }
  }

  test("zscoreQuantity: exact per-group standardization from integer sums") {
    // group A: quantities 2, 4, 6 -> mean 4, pop. var ((3*56-144)/9)=8/3
    // group B: quantities 10, 10 -> var 0 -> z = NULL (degenerate group
    // surfaces explicitly, not as an ANSI DIVIDE_BY_ZERO crash)
    val li = Seq(
      (1L, 1, "A", 2.0), (1L, 2, "A", 4.0), (2L, 1, "A", 6.0),
      (3L, 1, "B", 10.0), (3L, 2, "B", 10.0)
    ).toDF("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
    val got = Quality.zscoreQuantity(li)
      .select("l_orderkey", "l_linenumber", "z")
      .as[(Long, Long, Option[Double])].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    val sd = math.sqrt((3.0 * 56 - 12 * 12) / 9.0)
    assert(got((1L, 1L)) === Some((2.0 - 4.0) / sd))
    assert(got((1L, 2L)) === Some((4.0 - 4.0) / sd))
    assert(got((2L, 1L)) === Some((6.0 - 4.0) / sd))
    assert(got((3L, 1L)) === None)
    assert(got((3L, 2L)) === None)
  }

  test("madQuantity: interpolated group median, exact dyadic MAD, " +
      "degenerate group gives zero") {
    // A: 1,2,3,4 -> median 2.5; deviations 1.5,0.5,0.5,1.5 -> MAD 1.0
    // B: single 10 -> median 10, MAD 0
    val li = Seq(
      ("A", 1.0), ("A", 2.0), ("A", 3.0), ("A", 4.0), ("B", 10.0))
      .toDF("l_returnflag", "l_quantity")
    val r = Quality.madQuantity(li)
      .select("l_returnflag", "n", "median_qty", "mad_qty")
      .as[(String, Long, Double, Double)].collect().toSet
    assert(r === Set(("A", 4L, 2.5, 1.0), ("B", 1L, 10.0, 0.0)))
  }

  test("decileBinning: equal-count bins, boundary rows stay in the " +
      "lower bin") {
    // 10 distinct prices -> exactly one row per decile
    val li = (1 to 10).map(i => (i.toLong, 1, "A", 1.0, i * 10.0))
      .toDF("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity",
        "l_extendedprice")
    val got = Quality.decileBinning(li)
      .select("l_orderkey", "decile").as[(Long, Long)].collect().toMap
    assert(got === (1 to 10).map(i => i.toLong -> i.toLong).toMap)
  }

  test("keySkew: gini 0 on uniform keys, grows with concentration, " +
      "top_share exact") {
    val uniform = (1 to 100).map(i => (i % 10).toLong).toDF("k2")
    val g0 = Quality.keySkew(uniform, "k2", "u").first()
    assert(g0.getDouble(4) === 0.0)
    assert(g0.getDouble(3) === 0.1)

    val hot = (Seq.fill(91)(0L) ++ (1L to 9L)).toDF("k2")
    val g1 = Quality.keySkew(hot, "k2", "h").first()
    assert(g1.getDouble(3) === 0.91)
    // hand-computed: counts asc = [1x9, 91]; sum(i*x) = 45 + 10*91 = 955
    // G = (2*955 - 11*100) / (10*100) = 810/1000
    assert(g1.getDouble(4) === 0.81)
    // HHI = (9*1 + 91^2) / 100^2
    assert(g1.getDouble(5) === (9.0 + 91.0 * 91) / 10000)
    assert(g0.getDouble(5) === 0.1) // uniform over 10 keys -> 1/10
  }

  test("featureCdf: inclusive tie semantics, banded decomposition " +
      "equals a direct cume_dist") {
    // group A: prices 1,1,2,3 (cents 100,100,200,300)
    //   cdf: both 100-rows 2/4; 200 -> 3/4; 300 -> 1.0
    val li = Seq(
      (1L, 1, "A", 1.0, 1.0), (2L, 1, "A", 1.0, 1.0),
      (3L, 1, "A", 1.0, 2.0), (4L, 1, "A", 1.0, 3.0),
      // group B spans digit bands: 9, 99, 100 cents
      (5L, 1, "B", 1.0, 0.09), (6L, 1, "B", 1.0, 0.99),
      (7L, 1, "B", 1.0, 1.00)
    ).toDF("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity",
      "l_extendedprice")
    val got = Quality.featureCdf(li)
      .select("l_orderkey", "cdf").as[(Long, Double)].collect().toMap
    assert(got(1L) === 0.5 && got(2L) === 0.5)
    assert(got(3L) === 0.75)
    assert(got(4L) === 1.0)
    assert(got(5L) === 1.0 / 3)
    assert(got(6L) === 2.0 / 3)
    assert(got(7L) === 1.0)
  }

  test("zscoreQuantity plan: stats apply via broadcast join, no " +
      "full-table window") {
    val li = Seq((1L, 1, "A", 2.0), (2L, 1, "B", 3.0))
      .toDF("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
    val plan = Quality.zscoreQuantity(li).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("crosstabChi2: marginals, expected counts, per-cell contributions") {
    // 2x2 balanced design: every expected = 4*4/8 = 2, every |obs-exp| = 1,
    // so each cell contributes (1)^2/2 = 0.5
    val ev = (Seq.fill(3)(("a", ts("2024-01-05 00:00:00"))) ++
      Seq(("a", ts("2024-02-05 00:00:00"))) ++
      Seq(("b", ts("2024-01-06 00:00:00"))) ++
      Seq.fill(3)(("b", ts("2024-02-06 00:00:00"))))
      .toDF("event_type", "ts")
    val r = Quality.crosstabChi2(ev)
      .select("event_type", "month", "obs", "row_tot", "col_tot",
        "expected", "chi2_cell")
      .as[(String, Long, Long, Long, Long, Double, Double)].collect().toSet
    assert(r === Set(
      ("a", 1L, 3L, 4L, 4L, 2.0, 0.5),
      ("a", 2L, 1L, 4L, 4L, 2.0, 0.5),
      ("b", 1L, 1L, 4L, 4L, 2.0, 0.5),
      ("b", 2L, 3L, 4L, 4L, 2.0, 0.5)))
  }
  test("freshnessAuditOn: lag against the corpus reference date, SLA " +
      "verdicts, exact counts") {
    val a = Seq(("2024-01-08", 1), ("2024-01-10", 2))
      .toDF("d", "x").select(col("d").cast("timestamp").as("d"), col("x"))
    val b = Seq(("2024-01-01", 1))
      .toDF("d", "x").select(col("d").cast("timestamp").as("d"), col("x"))
    val r = Quality.freshnessAuditOn(
        Seq(("a", a, "d"), ("b", b, "d")), Map("a" -> 1L, "b" -> 5L))
      .select("table_name", "n_rows", "max_date", "lag_days", "sla_days",
        "is_stale")
      .as[(String, Long, String, Long, Long, Boolean)].collect().toSet
    assert(r === Set(
      ("a", 2L, "2024-01-10", 0L, 1L, false),
      ("b", 1L, "2024-01-01", 9L, 5L, true)))
  }
  test("uniquenessAuditOn: duplicate surplus and null keys counted, " +
      "clean table passes") {
    val a = Seq(Some(1L), Some(1L), Some(2L), None)
      .toDF("k")
    val b = Seq(1L, 2L, 3L).toDF("k")
    val r = Quality.uniquenessAuditOn(Seq(("a", a, "k"), ("b", b, "k")))
      .select("pk", "n_rows", "n_distinct", "n_dup", "n_null", "is_unique")
      .as[(String, Long, Long, Long, Long, Boolean)].collect().toSet
    // table a: 4 rows, distinct non-null keys {1,2} -> dup surplus 2
    assert(r === Set(
      ("a.k", 4L, 2L, 2L, 1L, false),
      ("b.k", 3L, 3L, 0L, 0L, true)))
  }

  test("targetEncode: out-of-fold means exclude the own fold; a " +
      "category living entirely in one fold shrinks to the global mean") {
    def fold(ok: Long) = ok * 2654435761L % 4294967296L % Quality.TeFolds
    // two segA orders in DIFFERENT folds, one segB order
    val okA1 = 1L
    val okA2 = (2L to 100L).find(k => fold(k) != fold(okA1)).get
    val okB = 7L
    val cust = Seq((10L, "c", 1L, 0.0, "segA"), (20L, "c", 1L, 0.0, "segB"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
    val ord = Seq((okA1, 10L, 100.0), (okA2, 10L, 300.0), (okB, 20L, 500.0))
      .map { case (ok, ck, p) =>
        (ok, ck, "O", p, ts("1996-01-01 00:00:00"), "1-URGENT") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val r = Quality.targetEncode(ord, cust).collect()
      .map(x => (x.getAs[String]("category"), x.getAs[Long]("fold")) ->
        (x.getAs[Long]("n_oof"), x.getAs[Long]("sum_oof_cents"),
          x.getAs[Double]("encoded_cents"))).toMap
    assert(r.size === 3)
    // global: n_g = 3, sum_g = 90000 cents -> mean 30000
    // segA/fold(okA1): oof = {okA2} -> (3*30000 + 100*90000)/(3*101)
    assert(r(("segA", fold(okA1))) ===
      ((1L, 30000L, 9090000.0 / 303.0)))
    assert(r(("segA", fold(okA2))) ===
      ((1L, 10000L, 9030000.0 / 303.0)))
    // segB entirely in its own fold: zero out-of-fold evidence ->
    // the m-estimate collapses to the exact global mean
    assert(r(("segB", fold(okB))) === ((0L, 0L, 30000.0)))
  }
}

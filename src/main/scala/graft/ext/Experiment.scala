package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** A/B experiment analysis over the events stream: deterministic variant
  * assignment, per-variant conversion, and Wilson score confidence
  * intervals — the readout every experimentation platform computes, and
  * a natural consumer of the events table the reference ingests
  * (`events` has no analysis stage in `dags/dag.py`).
  *
  * == Determinism contract ==
  * The Wilson interval is pure arithmetic over two exact counts
  * (distinct users, distinct converters): `+ − × ÷ sqrt` are all
  * correctly-rounded IEEE-754 operations, so as long as BOTH engines
  * evaluate the same expression tree over the same integers the result
  * is bit-identical — the oracle SQL mirrors this code's operand order
  * and parenthesization step for step (the same argument as
  * graft.etl.Gold's single-division rule, extended to a fixed DAG of
  * divisions and one square root). All literals are explicit doubles on
  * both sides (DuckDB would otherwise parse `1.96` as DECIMAL).
  *
  * == Scale shape ==
  * One hash aggregate over events; the two distinct counts share the
  * same grouping so Catalyst plans a single expand + two-phase
  * aggregate. Variant cardinality is 2 — the post-aggregate arithmetic
  * is metadata-sized.
  */
object Experiment {

  private val Z = 1.96          // 95% two-sided normal quantile
  private val ZZ = 1.96 * 1.96  // folded in binary64, same bits as oracle's

  /** Per-variant trials, conversions, and the 95% Wilson interval.
    * Variant = `user_id mod 2` — deterministic assignment every engine
    * reproduces (a production rollout would hash a salt+id; the modulus
    * keeps the oracle trivially identical).
    * Conversion = user emitted at least one `purchase` event.
    */
  def wilsonAb(ev: DataFrame): DataFrame = {
    val agg = ev
      .select((col("user_id") % 2).cast("long").as("variant"),
        col("user_id"), col("event_type"))
      .groupBy("variant")
      .agg(countDistinct(col("user_id")).as("n_users"),
        countDistinct(when(col("event_type") === "purchase",
          col("user_id"))).as("n_converted"))
    agg
      .withColumn("p_hat",
        col("n_converted").cast("double") / col("n_users"))
      .withColumn("denom", lit(1.0) + lit(ZZ) / col("n_users"))
      .withColumn("cnum",
        col("p_hat") + lit(ZZ) / (lit(2.0) * col("n_users")))
      .withColumn("rt", sqrt(
        col("p_hat") * (lit(1.0) - col("p_hat")) / col("n_users") +
          lit(ZZ) / (lit(4.0) * (col("n_users") * col("n_users")))))
      .select(col("variant"), col("n_users"), col("n_converted"),
        col("p_hat"),
        (col("cnum") / col("denom") - lit(Z) * col("rt") / col("denom"))
          .as("wilson_lo"),
        (col("cnum") / col("denom") + lit(Z) * col("rt") / col("denom"))
          .as("wilson_hi"))
  }

  /** Mann–Whitney U rank-sum test of `value` between the two variants —
    * the nonparametric A/B readout (no normality assumption on the
    * metric). Everything through the U statistic is EXACT: pooled ranks
    * are computed at the DISTINCT-VALUE level (cents), where a tied
    * group's average rank `below + (t+1)/2` doubles to the integer
    * `2·below + t + 1` — so rank sums and U carry a ×2 scale and never
    * touch a float. The z-score (normal approximation, no tie
    * correction — documented) is the usual fixed DAG of
    * correctly-rounded ops over those integers.
    *
    * Scale shape: one fact aggregate to (value → per-variant counts);
    * the cumulative rides the VALUE-LEVEL table, whose unpartitioned
    * window is bounded by the cents domain (~5e4 rows at any corpus
    * size — same bounded-domain argument as
    * [[graft.ext.Retail.skylineParts]]).
    */
  def mannWhitney(ev: DataFrame): DataFrame = {
    val vl = ev
      .select((col("user_id") % 2).cast("long").as("variant"),
        round(col("value") * 100).cast("long").as("v"))
      .groupBy("v")
      .agg(sum(when(col("variant") === 0, 1L).otherwise(0L)).as("c0"),
        sum(when(col("variant") === 1, 1L).otherwise(0L)).as("c1"))
      .withColumn("t", col("c0") + col("c1"))
    val wCum = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = vl
      .withColumn("below", coalesce(sum("t").over(wCum), lit(0L)))
      .withColumn("rank2", lit(2L) * col("below") + col("t") + 1L)
    val agg = ranked.agg(
      sum("c0").as("n0"), sum("c1").as("n1"),
      sum(col("c0") * col("rank2")).as("r0_2x"),
      sum(col("c1") * col("rank2")).as("r1_2x"))
    val z = (u2x: Column, n0: Column, n1: Column) =>
      ((u2x - n0 * n1).cast("double") / lit(2.0)) /
        sqrt((n0 * n1).cast("double") * (n0 + n1 + lit(1L)) / lit(12.0))
    agg.select(explode(array(
        struct(lit(0L).as("variant"), col("n0").as("n"),
          col("r0_2x").as("rank_sum_2x"),
          (col("r0_2x") - col("n0") * (col("n0") + 1L)).as("u_2x"),
          z(col("r0_2x") - col("n0") * (col("n0") + 1L), col("n0"),
            col("n1")).as("z")),
        struct(lit(1L).as("variant"), col("n1").as("n"),
          col("r1_2x").as("rank_sum_2x"),
          (col("r1_2x") - col("n1") * (col("n1") + 1L)).as("u_2x"),
          z(col("r1_2x") - col("n1") * (col("n1") + 1L), col("n1"),
            col("n0")).as("z")))).as("s"))
      .select(col("s.variant").as("variant"), col("s.n").as("n"),
        col("s.rank_sum_2x").as("rank_sum_2x"), col("s.u_2x").as("u_2x"),
        col("s.z").as("z"))
  }

  /** CUPED (Controlled-experiment Using Pre-Experiment Data, Deng et al.
    * 2013): variance-reduced A/B readout. The event calendar is split at
    * its midpoint day; each user's PRE-period spend becomes the covariate
    * X and the EXPERIMENT-period spend the metric Y, and the adjusted
    * metric `Y − θ·(X − X̄)` with `θ = cov(X,Y)/var(X)` removes the
    * between-user variance X explains. θ is pooled across both arms
    * (assignment is independent of pre-period behavior, the standard
    * CUPED estimator).
    *
    * == Determinism contract ==
    * Per-user X/Y are exact cent sums; n·Σxy − Σx·Σy and the two
    * variance analogues are exact DECIMAL(38,0) integers (DuckDB
    * HUGEINT on the twin). Each emitted double is a fixed tree of
    * correctly-rounded casts and one division per ratio, mirrored
    * operand-for-operand in the twin. Zero-variance degenerate inputs
    * pin θ and ρ² to 0 via the same CASE on both sides (IEEE ÷0 would
    * otherwise diverge engines).
    *
    * == Scale shape ==
    * One bounds aggregate (2 longs, broadcast), one per-user fact
    * aggregate, then a user-level aggregate with map-side partials —
    * three shuffles total, none keyed on anything skewable (user_id is
    * the natural even key). The per-variant and pooled moments ride the
    * SAME aggregate via conditional sums, so no second pass over users.
    */
  def cuped(ev: DataFrame): DataFrame = {
    val withDay = ev.select(
      col("user_id"),
      datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
        .cast("long").as("day"),
      round(col("value") * 100).cast("long").as("cents"))
    val bounds = withDay.agg(
      min("day").as("min_day"), max("day").as("max_day"))
      .withColumn("split_day", expr("(min_day + max_day) div 2"))
    val perUser = withDay.crossJoin(broadcast(bounds))
      .groupBy("user_id")
      .agg(
        sum(when(col("day") <= col("split_day"), col("cents"))
          .otherwise(0L)).as("x"),
        sum(when(col("day") > col("split_day"), col("cents"))
          .otherwise(0L)).as("y"))
      .withColumn("variant", (col("user_id") % 2).cast("long"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val m = perUser.agg(
      count(lit(1)).cast("long").as("n"),
      sum(dec(col("x"))).as("sx"), sum(dec(col("y"))).as("sy"),
      sum(dec(col("x")) * dec(col("x"))).as("sxx"),
      sum(dec(col("x")) * dec(col("y"))).as("sxy"),
      sum(dec(col("y")) * dec(col("y"))).as("syy"),
      sum(when(col("variant") === 0, 1L).otherwise(0L)).as("n0"),
      sum(when(col("variant") === 0, dec(col("x")))
        .otherwise(dec(lit(0L)))).as("sx0"),
      sum(when(col("variant") === 0, dec(col("y")))
        .otherwise(dec(lit(0L)))).as("sy0"),
      sum(when(col("variant") === 1, 1L).otherwise(0L)).as("n1"),
      sum(when(col("variant") === 1, dec(col("x")))
        .otherwise(dec(lit(0L)))).as("sx1"),
      sum(when(col("variant") === 1, dec(col("y")))
        .otherwise(dec(lit(0L)))).as("sy1"))
    val d = (c: Column) => c.cast("double")
    val moments = m
      .withColumn("cov_n", d(dec(col("n")) * col("sxy") -
        col("sx") * col("sy")))
      .withColumn("varx_n", d(dec(col("n")) * col("sxx") -
        col("sx") * col("sx")))
      .withColumn("vary_n", d(dec(col("n")) * col("syy") -
        col("sy") * col("sy")))
      .withColumn("theta",
        when(col("varx_n") === 0.0, lit(0.0))
          .otherwise(col("cov_n") / col("varx_n")))
      .withColumn("rho2",
        when(col("varx_n") === 0.0 || col("vary_n") === 0.0, lit(0.0))
          .otherwise((col("cov_n") * col("cov_n")) /
            (col("varx_n") * col("vary_n"))))
      .withColumn("mean_x_all", d(col("sx")) / d(col("n")))
    moments.select(explode(array(
        struct(lit(0L).as("variant"), col("n0").as("n_users"),
          col("sx0").as("sx_v"), col("sy0").as("sy_v"),
          col("theta"), col("rho2"), col("mean_x_all")),
        struct(lit(1L).as("variant"), col("n1").as("n_users"),
          col("sx1").as("sx_v"), col("sy1").as("sy_v"),
          col("theta"), col("rho2"), col("mean_x_all")))).as("s"))
      .select(col("s.variant").as("variant"),
        col("s.n_users").as("n_users"),
        (d(col("s.sx_v")) / d(col("s.n_users"))).as("mean_x"),
        (d(col("s.sy_v")) / d(col("s.n_users"))).as("mean_y"),
        col("s.theta").as("theta"), col("s.rho2").as("rho2"),
        (d(col("s.sy_v")) / d(col("s.n_users")) - col("s.theta") *
          (d(col("s.sx_v")) / d(col("s.n_users")) - col("s.mean_x_all")))
          .as("mean_y_adj"))
  }

  /** Sample-ratio-mismatch (SRM) guardrail, per exposure segment — the
    * experiment-health check every platform runs BEFORE reading any
    * metric: if the observed variant split deviates from the designed
    * 50/50 beyond chance, the experiment is corrupted (logging loss,
    * redirect bias, bot filtering applied asymmetrically) and all
    * readouts above are void. Segment = `event_type`, because a per-
    * segment SRM localizes WHERE exposure logging broke (a global pass
    * can hide two offsetting segment failures).
    *
    * For two arms with expectation n/2 each the chi-square statistic
    * collapses algebraically to `(n0 − n1)² / n` (df = 1). The flag is
    * decided IN EXACT INTEGERS — `100000·(n0−n1)² > 384146·n` is the
    * α=0.05 critical value 3.84146 (χ²₁ 0.95 quantile to 5 dp; 3.841
    * would mis-flag chi2 in (3.841, 3.84146]) cross-multiplied through
    * DECIMAL(38,0)/HUGEINT so the products can't wrap at billion-user n
    * — so engine and oracle can never disagree on the verdict even if a
    * float differed in the last bit; `chi2` itself is one
    * correctly-rounded division over the same integers.
    *
    * Scale shape: one expand + two-phase distinct aggregate keyed on
    * event_type (bounded segment domain); everything after is
    * per-segment scalar arithmetic. No joins, no windows.
    */
  def srm(ev: DataFrame): DataFrame = {
    val agg = ev
      .select(col("event_type"),
        (col("user_id") % 2).cast("long").as("variant"), col("user_id"))
      .groupBy("event_type")
      .agg(
        countDistinct(when(col("variant") === 0, col("user_id"))).as("n0"),
        countDistinct(when(col("variant") === 1, col("user_id"))).as("n1"))
    agg
      .withColumn("n", col("n0") + col("n1"))
      .withColumn("dd", (col("n0") - col("n1")) * (col("n0") - col("n1")))
      .select(col("event_type"), col("n0"), col("n1"), col("n"),
        (col("dd").cast("double") / col("n").cast("double")).as("chi2"),
        when(col("dd").cast("decimal(38,0)") * lit(100000L) >
            col("n").cast("decimal(38,0)") * lit(384146L), 1L)
          .otherwise(0L).as("srm_flag"))
  }

  /** MINIMUM DETECTABLE EFFECT (MDE) at 80% power / 5% two-sided α —
    * the experiment-SIZING readout run before launch and alongside
    * every null result ("we saw nothing" means nothing without "and we
    * could have seen X"): per arm, n and the per-user spend variance
    * from exact cent moments, then
    * `MDE = (z_{α/2} + z_β) · √(s²₀/n₀ + s²₁/n₁)` with the standard
    * constants 1.96 and 0.8416 folded as literals on both engines.
    * Also emits the relative MDE against the pooled mean — the number
    * product teams actually quote.
    *
    * Exactness: one user-level aggregate carries both arms' n, Σx, Σx²
    * (exact DECIMAL(38,0) / HUGEINT); every double is the same fixed
    * tree of casts, three divisions, one sqrt, mirrored
    * operand-for-operand in the twin. Degenerate arms (n ≤ 1 or zero
    * pooled mean) pin the affected outputs to NULL via the same CASE.
    * Domain guard (the portable-hash-guard pattern): the variance
    * products `n·Σx²` and `(Σx)²` stay exact only below 10³⁸ — past
    * that Spark's non-ANSI decimal silently NULLs while DuckDB's
    * HUGEINT raises, so BOTH sides raise_error/error() when
    * `n > 10⁸ or Σx² > 10³⁰` (which bounds n·Σx² < 10³⁸ and, since
    * (Σx)² ≤ n·Σx², the square too) — the engines fail loudly
    * together instead of diverging.
    *
    * Scale shape: one corpus aggregate to per-user spend, one
    * single-row moment aggregate — the [[cuped]] plan minus the
    * calendar split.
    */
  def mde(ev: DataFrame): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val d = (c: Column) => c.cast("double")
    val perUser = ev
      .select(col("user_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy("user_id")
      .agg(sum("cents").as("x"))
      .withColumn("variant", (col("user_id") % 2).cast("long"))
    val m = perUser.agg(
      sum(when(col("variant") === 0, 1L).otherwise(0L)).as("n0"),
      sum(when(col("variant") === 0, dec(col("x")))
        .otherwise(dec(lit(0L)))).as("sx0"),
      sum(when(col("variant") === 0, dec(col("x")) * dec(col("x")))
        .otherwise(dec(lit(0L)))).as("sxx0"),
      sum(when(col("variant") === 1, 1L).otherwise(0L)).as("n1"),
      sum(when(col("variant") === 1, dec(col("x")))
        .otherwise(dec(lit(0L)))).as("sx1"),
      sum(when(col("variant") === 1, dec(col("x")) * dec(col("x")))
        .otherwise(dec(lit(0L)))).as("sxx1"))
    // var = (n·Σx² − (Σx)²) / (n·(n−1)) as one double over exact ints;
    // moment-domain guard so decimal(38,0) products can't silently NULL
    val momentCap =
      lit("1000000000000000000000000000000").cast("decimal(38,0)")
    def variance(n: Column, sx: Column, sxx: Column): Column =
      when(n > 100000000L || sxx > momentCap, raise_error(lit(
        "mde: moments outside the exact decimal(38,0) domain " +
          "(n > 1e8 or sum(x^2) > 1e30 would overflow n*sxx)"))
        .cast("double"))
        .when(n <= 1L, lit(null).cast("double"))
        .otherwise(d(dec(n) * sxx - sx * sx) /
          d(dec(n) * dec(n - 1L)))
    m.withColumn("var0", variance(col("n0"), col("sx0"), col("sxx0")))
      .withColumn("var1", variance(col("n1"), col("sx1"), col("sxx1")))
      .withColumn("mean_all",
        when(col("n0") + col("n1") === 0L, lit(null).cast("double"))
          .otherwise(d(col("sx0") + col("sx1")) / d(col("n0") + col("n1"))))
      .withColumn("mde_cents",
        when(col("var0").isNull || col("var1").isNull,
          lit(null).cast("double"))
          .otherwise(lit(1.96 + 0.8416) *
            sqrt(col("var0") / d(col("n0")) + col("var1") / d(col("n1")))))
      .select(col("n0"), col("n1"), col("var0"), col("var1"),
        col("mean_all"), col("mde_cents"),
        when(col("mde_cents").isNull || col("mean_all").isNull ||
          col("mean_all") === 0.0, lit(null).cast("double"))
          .otherwise(col("mde_cents") / col("mean_all")).as("mde_rel"))
  }

  /** Driver-contract registration (SparkEntry aggregates these). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ab_test_wilson" -> ((s, d) => wilsonAb(Tables.events(s, d))),
    "ab_test_mann_whitney" -> ((s, d) => mannWhitney(Tables.events(s, d))),
    "exp_cuped" -> ((s, d) => cuped(Tables.events(s, d))),
    "exp_srm" -> ((s, d) => srm(Tables.events(s, d))),
    "exp_mde" -> ((s, d) => mde(Tables.events(s, d))),
  )

  /** DuckDB twin — intermediate CTE columns pin the operand order to
    * exactly this code's, so every IEEE op rounds identically.
    */
  def oracleSql: Map[String, String] = Map(
    "exp_mde" ->
      """WITH pu AS (
        |  SELECT user_id,
        |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |           AS x,
        |         user_id % 2 AS variant
        |  FROM events GROUP BY user_id),
        |m AS (
        |  SELECT CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END)
        |              AS BIGINT) AS n0,
        |         sum(CASE WHEN variant = 0 THEN CAST(x AS HUGEINT)
        |                  ELSE 0 END) AS sx0,
        |         sum(CASE WHEN variant = 0
        |                  THEN CAST(x AS HUGEINT) * CAST(x AS HUGEINT)
        |                  ELSE 0 END) AS sxx0,
        |         CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END)
        |              AS BIGINT) AS n1,
        |         sum(CASE WHEN variant = 1 THEN CAST(x AS HUGEINT)
        |                  ELSE 0 END) AS sx1,
        |         sum(CASE WHEN variant = 1
        |                  THEN CAST(x AS HUGEINT) * CAST(x AS HUGEINT)
        |                  ELSE 0 END) AS sxx1
        |  FROM pu),
        |v AS (
        |  SELECT *,
        |         CASE WHEN n0 > 100000000 OR sxx0 >
        |                CAST('1000000000000000000000000000000' AS HUGEINT)
        |              THEN CAST(error('mde: moments outside the exact '
        |                              || 'decimal(38,0) domain') AS DOUBLE)
        |              WHEN n0 <= 1 THEN NULL
        |              ELSE CAST(CAST(n0 AS HUGEINT) * sxx0 - sx0 * sx0
        |                        AS DOUBLE)
        |                 / CAST(CAST(n0 AS HUGEINT)
        |                        * CAST(n0 - 1 AS HUGEINT) AS DOUBLE)
        |         END AS var0,
        |         CASE WHEN n1 > 100000000 OR sxx1 >
        |                CAST('1000000000000000000000000000000' AS HUGEINT)
        |              THEN CAST(error('mde: moments outside the exact '
        |                              || 'decimal(38,0) domain') AS DOUBLE)
        |              WHEN n1 <= 1 THEN NULL
        |              ELSE CAST(CAST(n1 AS HUGEINT) * sxx1 - sx1 * sx1
        |                        AS DOUBLE)
        |                 / CAST(CAST(n1 AS HUGEINT)
        |                        * CAST(n1 - 1 AS HUGEINT) AS DOUBLE)
        |         END AS var1,
        |         CASE WHEN n0 + n1 = 0 THEN NULL
        |              ELSE CAST(sx0 + sx1 AS DOUBLE)
        |                 / CAST(n0 + n1 AS DOUBLE) END AS mean_all
        |  FROM m),
        |w AS (
        |  SELECT *,
        |         CASE WHEN var0 IS NULL OR var1 IS NULL THEN NULL
        |              ELSE (CAST(1.96 AS DOUBLE) + CAST(0.8416 AS DOUBLE))
        |                   * sqrt(var0 / CAST(n0 AS DOUBLE)
        |                        + var1 / CAST(n1 AS DOUBLE))
        |         END AS mde_cents
        |  FROM v)
        |SELECT n0, n1, var0, var1, mean_all, mde_cents,
        |       CASE WHEN mde_cents IS NULL OR mean_all IS NULL
        |                 OR mean_all = 0.0 THEN NULL
        |            ELSE mde_cents / mean_all END AS mde_rel
        |FROM w""".stripMargin,
    "exp_srm" ->
      """WITH a AS (
        |  SELECT event_type,
        |         count(DISTINCT CASE WHEN user_id % 2 = 0
        |                             THEN user_id END) AS n0,
        |         count(DISTINCT CASE WHEN user_id % 2 = 1
        |                             THEN user_id END) AS n1
        |  FROM events GROUP BY 1),
        |b AS (
        |  SELECT *, n0 + n1 AS n, (n0 - n1) * (n0 - n1) AS dd FROM a)
        |SELECT event_type, n0, n1, n,
        |       CAST(dd AS DOUBLE) / CAST(n AS DOUBLE) AS chi2,
        |       CAST(CASE WHEN CAST(dd AS HUGEINT) * 100000
        |                       > CAST(n AS HUGEINT) * 384146
        |                  THEN 1 ELSE 0 END
        |            AS BIGINT) AS srm_flag
        |FROM b""".stripMargin,
    "exp_cuped" ->
      """WITH wd AS (
        |  SELECT user_id,
        |         datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |           AS day,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |b AS (
        |  SELECT min(day) AS min_day, max(day) AS max_day,
        |         (min(day) + max(day)) // 2 AS split_day
        |  FROM wd),
        |pu AS (
        |  SELECT user_id, user_id % 2 AS variant,
        |         CAST(sum(CASE WHEN day <= split_day THEN cents
        |                       ELSE 0 END) AS BIGINT) AS x,
        |         CAST(sum(CASE WHEN day > split_day THEN cents
        |                       ELSE 0 END) AS BIGINT) AS y
        |  FROM wd CROSS JOIN b
        |  GROUP BY user_id),
        |m AS (
        |  SELECT count(*) AS n,
        |         sum(CAST(x AS HUGEINT)) AS sx,
        |         sum(CAST(y AS HUGEINT)) AS sy,
        |         sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
        |         sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
        |         sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy,
        |         CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END)
        |              AS BIGINT) AS n0,
        |         sum(CASE WHEN variant = 0 THEN CAST(x AS HUGEINT)
        |                  ELSE 0 END) AS sx0,
        |         sum(CASE WHEN variant = 0 THEN CAST(y AS HUGEINT)
        |                  ELSE 0 END) AS sy0,
        |         CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END)
        |              AS BIGINT) AS n1,
        |         sum(CASE WHEN variant = 1 THEN CAST(x AS HUGEINT)
        |                  ELSE 0 END) AS sx1,
        |         sum(CASE WHEN variant = 1 THEN CAST(y AS HUGEINT)
        |                  ELSE 0 END) AS sy1
        |  FROM pu),
        |mo AS (
        |  SELECT *,
        |         CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE)
        |           AS cov_n,
        |         CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE)
        |           AS varx_n,
        |         CAST(CAST(n AS HUGEINT) * syy - sy * sy AS DOUBLE)
        |           AS vary_n,
        |         CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean_x_all
        |  FROM m),
        |mo2 AS (
        |  SELECT *,
        |         CASE WHEN varx_n = 0.0 THEN 0.0
        |              ELSE cov_n / varx_n END AS theta,
        |         CASE WHEN varx_n = 0.0 OR vary_n = 0.0 THEN 0.0
        |              ELSE (cov_n * cov_n) / (varx_n * vary_n) END AS rho2
        |  FROM mo),
        |v AS (
        |  SELECT CAST(0 AS BIGINT) AS variant, n0 AS n_users,
        |         sx0 AS sx_v, sy0 AS sy_v, theta, rho2, mean_x_all
        |  FROM mo2
        |  UNION ALL
        |  SELECT CAST(1 AS BIGINT), n1, sx1, sy1, theta, rho2, mean_x_all
        |  FROM mo2)
        |SELECT variant, n_users,
        |       CAST(sx_v AS DOUBLE) / CAST(n_users AS DOUBLE) AS mean_x,
        |       CAST(sy_v AS DOUBLE) / CAST(n_users AS DOUBLE) AS mean_y,
        |       theta, rho2,
        |       CAST(sy_v AS DOUBLE) / CAST(n_users AS DOUBLE) - theta *
        |         (CAST(sx_v AS DOUBLE) / CAST(n_users AS DOUBLE) -
        |          mean_x_all) AS mean_y_adj
        |FROM v""".stripMargin,
    "ab_test_mann_whitney" ->
      """WITH vl AS (
        |  SELECT CAST(round(value * 100) AS BIGINT) AS v,
        |         CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
        |              AS BIGINT) AS c0,
        |         CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
        |              AS BIGINT) AS c1
        |  FROM events GROUP BY 1),
        |r AS (
        |  SELECT *, c0 + c1 AS t,
        |         coalesce(CAST(sum(c0 + c1) OVER (ORDER BY v
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |           AS BIGINT), 0) AS below
        |  FROM vl),
        |r2 AS (SELECT *, 2 * below + t + 1 AS rank2 FROM r),
        |a AS (
        |  SELECT CAST(sum(c0) AS BIGINT) AS n0,
        |         CAST(sum(c1) AS BIGINT) AS n1,
        |         CAST(sum(c0 * rank2) AS BIGINT) AS r0_2x,
        |         CAST(sum(c1 * rank2) AS BIGINT) AS r1_2x
        |  FROM r2),
        |u AS (
        |  SELECT CAST(0 AS BIGINT) AS variant, n0 AS n,
        |         r0_2x AS rank_sum_2x,
        |         r0_2x - n0 * (n0 + 1) AS u_2x, n0, n1 FROM a
        |  UNION ALL
        |  SELECT CAST(1 AS BIGINT) AS variant, n1 AS n,
        |         r1_2x AS rank_sum_2x,
        |         r1_2x - n1 * (n1 + 1) AS u_2x, n0, n1 FROM a)
        |SELECT variant, n, rank_sum_2x, u_2x,
        |       (CAST(u_2x - n0 * n1 AS DOUBLE) / CAST(2.0 AS DOUBLE)) /
        |       sqrt(CAST(n0 * n1 AS DOUBLE) * (n0 + n1 + 1) /
        |            CAST(12.0 AS DOUBLE)) AS z
        |FROM u""".stripMargin,
    "ab_test_wilson" ->
      """WITH a AS (
        |  SELECT user_id % 2 AS variant,
        |         count(DISTINCT user_id) AS n_users,
        |         count(DISTINCT CASE WHEN event_type = 'purchase'
        |                             THEN user_id END) AS n_converted
        |  FROM events GROUP BY 1),
        |b AS (
        |  SELECT *,
        |         CAST(n_converted AS DOUBLE) / n_users AS p_hat,
        |         CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE) AS zz
        |  FROM a),
        |c AS (
        |  SELECT *,
        |         CAST(1.0 AS DOUBLE) + zz / n_users AS denom,
        |         p_hat + zz / (CAST(2.0 AS DOUBLE) * n_users) AS cnum,
        |         sqrt(p_hat * (CAST(1.0 AS DOUBLE) - p_hat) / n_users +
        |              zz / (CAST(4.0 AS DOUBLE) * (n_users * n_users)))
        |           AS rt
        |  FROM b)
        |SELECT variant, n_users, n_converted, p_hat,
        |       cnum / denom - CAST(1.96 AS DOUBLE) * rt / denom
        |         AS wilson_lo,
        |       cnum / denom + CAST(1.96 AS DOUBLE) * rt / denom
        |         AS wilson_hi
        |FROM c""".stripMargin,
  )
}

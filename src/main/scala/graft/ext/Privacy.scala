package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Privacy operators for a training-data pipeline: free-text PII redaction
  * (emails / phone numbers / IP addresses → placeholder tokens, with match
  * counts for audit) and structured-column anonymization (hash /
  * partial-mask of identifier columns), the two shapes every large-corpus
  * privacy pass runs before data leaves the curation boundary.
  *
  * == Scale design ==
  * Both operators are pure narrow scalar pipelines — regex match/replace
  * and hash functions inside whole-stage codegen, no shuffle, no UDFs —
  * so they scale linearly with input bytes exactly like [[TextAnalysis]].
  * The regex set is a compile-once constant per codegen'd plan, not
  * per-row work.
  *
  * The regexes use only syntax shared by Java's engine and RE2 (character
  * classes, bounded repetition, `\b`), so the DuckDB oracles run the
  * IDENTICAL patterns — the redaction is verified end-to-end, not
  * approximated.
  */
object Privacy {

  /** Shared Java/RE2 PII patterns. */
  val EmailPattern: String = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  val PhonePattern: String = """\b\d{3}-\d{4}\b"""
  val IpPattern: String    = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""

  /** Redact PII from a text column: count matches per category (the audit
    * trail a compliance pass needs), then replace email → phone → IP with
    * placeholder tokens. Replacement order matters only in that earlier
    * placeholders must not re-match later patterns — `<EMAIL>`/`<PHONE>`
    * contain no digits, so they can't.
    */
  def redactText(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df
      .withColumn("n_emails",
        size(regexp_extract_all(t, lit(EmailPattern), lit(0))))
      .withColumn("n_phones",
        size(regexp_extract_all(t, lit(PhonePattern), lit(0))))
      .withColumn("n_ips",
        size(regexp_extract_all(t, lit(IpPattern), lit(0))))
      .withColumn(textCol,
        regexp_replace(
          regexp_replace(
            regexp_replace(t, EmailPattern, "<EMAIL>"),
            PhonePattern, "<PHONE>"),
          IpPattern, "<IP>"))
  }

  /** The documents corpus is synthetic word-soup with no organic PII, so
    * the driver query plants a deterministic email / phone / IP derived
    * from `doc_id` into each document (identically in the oracle) and
    * redacts the result — the operator is exercised against text where
    * every pattern fires and the redacted output is exactly predictable.
    */
  def redactDocuments(docs: DataFrame): DataFrame = {
    val planted = docs.select(col("doc_id"),
      concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@mail.example.com or call 555-"),
        lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
        lit(" from 10."), pmod(col("doc_id"), lit(256)).cast("string"),
        lit(".0."), pmod(col("doc_id") * 7, lit(256)).cast("string"))
        .as("text"))
    redactText(planted, "text")
      .select(col("doc_id"), col("n_emails"), col("n_phones"), col("n_ips"),
        md5(col("text")).as("redacted_fp"),
        length(col("text")).as("n_chars_redacted"))
  }

  /** Structured-column anonymization over the customer dimension, the
    * three standard treatments side by side: stable hashing (SHA-256 of
    * the name — referential integrity survives, identity doesn't),
    * format-preserving partial masking (every digit but the last four
    * becomes 'X'), and generalization (account balance coarsened to a
    * 1000-unit bucket, the k-anonymity move for numeric quasi-identifiers).
    */
  def maskCustomers(customer: DataFrame): DataFrame =
    customer.select(
      col("c_custkey"),
      sha2(col("c_name"), 256).as("name_hash"),
      concat(
        regexp_replace(expr("substring(c_name, 1, length(c_name) - 4)"),
          "[0-9]", "X"),
        expr("substring(c_name, length(c_name) - 3, 4)")).as("name_masked"),
      floor(col("c_acctbal") / 1000).cast("long").as("acctbal_bucket"),
      col("c_mktsegment"))

  /** k-anonymity audit over a quasi-identifier tuple — the measurement
    * side of the anonymization [[maskCustomers]] performs: group rows by
    * the quasi-identifiers an attacker could link on (market segment,
    * nation, coarsened account balance), then report the equivalence-
    * class SIZE DISTRIBUTION — one row per class size k: how many
    * classes have exactly k members, how many rows they hold, and the
    * share of the table living at that anonymity level. `min(class_size)`
    * over the result IS the dataset's k-anonymity; the small-k rows are
    * the re-identification risk a release review flags.
    *
    * Scale shape: one hash aggregate over the table (QI → class size),
    * then an aggregate over the class table (size → histogram) — the
    * second input is class-domain-sized, the output is distinct-size-
    * sized (tiny). The 1-row total broadcasts; the share is exact
    * integers + one IEEE division.
    */
  def kAnonymityAudit(customer: DataFrame): DataFrame = {
    val classes = customer.groupBy(
        col("c_mktsegment"), col("c_nationkey"),
        floor(col("c_acctbal") / 1000).cast("long").as("acctbal_bucket"))
      .agg(count(lit(1)).as("class_size"))
    val total = customer.agg(count(lit(1)).as("n_total"))
    classes.groupBy("class_size")
      .agg(count(lit(1)).as("n_classes"))
      .crossJoin(broadcast(total))
      .select(col("class_size"), col("n_classes"),
        (col("class_size") * col("n_classes")).as("n_rows"),
        ((col("class_size") * col("n_classes")).cast("double") /
          col("n_total")).as("row_share"))
  }

  /** Driver-contract registration (SparkEntry aggregates these). */
  /** l-diversity audit, the companion to [[kAnonymityAudit]]: a
    * k-anonymous class is still re-identifiable if every member shares
    * the same SENSITIVE value, so per quasi-identifier class
    * (segment × nation) we count the distinct sensitive values
    * (account-balance k$-bucket) and roll classes up by that diversity
    * level, with the share of rows sitting below the usual l = 3 bar.
    * Two shrinking keyed aggregates + a 1-row broadcast — same scale
    * shape as the k-anonymity audit.
    */
  def lDiversityAudit(customer: DataFrame, lBar: Int = 3): DataFrame = {
    val classes = customer.groupBy(col("c_mktsegment"), col("c_nationkey"))
      .agg(countDistinct(floor(col("c_acctbal") / 1000).cast("long"))
          .as("l_div"),
        count(lit(1)).as("class_size"))
    val total = customer.agg(count(lit(1)).as("n_total"))
    classes.groupBy("l_div")
      .agg(count(lit(1)).as("n_classes"), sum("class_size").as("n_rows"))
      .crossJoin(broadcast(total))
      .select(col("l_div"), col("n_classes"), col("n_rows"),
        (col("n_rows").cast("double") / col("n_total")).as("row_share"),
        (col("l_div") < lBar).as("below_bar"))
  }

  /** t-closeness audit, completing the release-review trio with
    * [[kAnonymityAudit]] and [[lDiversityAudit]]: an l-diverse class
    * still leaks if its sensitive-value DISTRIBUTION skews far from the
    * table's, so per quasi-identifier class (segment × nation) we
    * compute the Earth Mover's Distance between the class's
    * account-balance-bucket distribution and the global one. For an
    * ordered 1-D attribute EMD has the closed form
    * `(1/(m−1)) Σ_k |CDF_class(k) − CDF_global(k)|`; cross-multiplying
    * the two CDFs onto the common denominator `n_class·N` makes every
    * cumulative difference an exact integer (`Σ_{i≤k}(cnt_i·N −
    * G_i·n_class)`), so `emd_scaled` hash-matches exactly and the
    * reported `emd` is one fixed IEEE tree (three double multiplies +
    * one divide) off it. Magnitudes: |D_k| ≤ n·N ≈ 2.3·10¹⁰ at sf0.1 —
    * int64-safe; a 10⁹-row deployment buckets to coarser units first
    * (same trade as graft.ext.Stats).
    *
    * Scale shape: two keyed aggregates over the table, then everything
    * runs on class-domain × bucket-domain rows (≤ ~1.5k) — the prefix
    * window is partitioned by class over the ≤ ~12-value bucket domain,
    * never over data-sized rows.
    */
  def tClosenessAudit(customer: DataFrame, tBar: Double = 0.15): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bucketed = customer.select(col("c_mktsegment"), col("c_nationkey"),
      floor(col("c_acctbal") / 1000).cast("long").as("b"))
    val glob = bucketed.groupBy("b").agg(count(lit(1)).as("g_cnt"))
    val tot = glob.agg(sum("g_cnt").as("n_total"),
      count(lit(1)).as("m_buckets"))
    val clsCnt = bucketed.groupBy("c_mktsegment", "c_nationkey", "b")
      .agg(count(lit(1)).as("cnt"))
    val classes = clsCnt.groupBy("c_mktsegment", "c_nationkey")
      .agg(sum("cnt").as("class_size"))
    val w = Window.partitionBy("c_mktsegment", "c_nationkey").orderBy("b")
    classes.crossJoin(broadcast(glob))
      .join(clsCnt, Seq("c_mktsegment", "c_nationkey", "b"), "left")
      .na.fill(0L, Seq("cnt"))
      .crossJoin(broadcast(tot))
      .withColumn("d",
        col("cnt") * col("n_total") - col("g_cnt") * col("class_size"))
      .withColumn("cum", sum("d").over(w))
      .groupBy("c_mktsegment", "c_nationkey", "class_size", "m_buckets",
        "n_total")
      .agg(sum(abs(col("cum"))).as("emd_scaled"))
      .withColumn("emd", col("emd_scaled").cast("double") /
        ((col("m_buckets") - 1).cast("double") *
          col("class_size").cast("double") * col("n_total").cast("double")))
      .withColumn("above_bar", col("emd") > tBar)
      .select("c_mktsegment", "c_nationkey", "class_size", "emd_scaled",
        "emd", "above_bar")
  }

  /** Truncation bound of the two-sided geometric noise: support −B..B. */
  val DpB = 8

  /** Cumulative weights of the truncated two-sided geometric with
    * α = 1/2 over −8..7 (the +8 tail is the CASE's ELSE): weight of k
    * is 256·(1/2)^|k|, total 766. All-integer by construction.
    */
  val DpGeomCumWeights: Seq[Int] =
    Seq(1, 3, 7, 15, 31, 63, 127, 255, 511, 639, 703, 735, 751, 759, 763, 765)

  /** u32 inverse-CDF cut points: floor(cum · 2³² / 766), computed in
    * exact BigInt arithmetic — both the Spark plan and the DuckDB twin
    * consume these as integer LITERALS, so no engine evaluates any
    * transcendental at query time (the [[graft.ext.Stats.PoissonCdfU32]]
    * precedent).
    */
  val DpThresholdsU32: Seq[Long] = DpGeomCumWeights
    .map(c => (BigInt(c) * BigInt(2).pow(32) / 766).toLong)

  /** DIFFERENTIALLY-PRIVATE NOISY COUNTS (geometric mechanism, Ghosh–
    * Roughgarden–Sundararajan 2009) per nation — the release step after
    * the k-anon/l-div/t-closeness audits: per-nation customer counts
    * plus two-sided geometric noise with α = 1/2 (ε = ln 2 for the
    * ±1-sensitivity count), truncated at ±[[DpB]] (tail mass < 2⁻⁸/383
    * per side — the standard bounded-noise variant).
    *
    * Determinism: the draw is the integer inverse-CDF of a Knuth
    * multiplicative hash of the group key plus `salt` —
    * u = ((key + salt)·2654435761) mod 2³² cut by [[DpThresholdsU32]]
    * — so the twin replays it exactly. `salt` is the per-release
    * secret a production deployment draws fresh each release (an
    * adversary who knows the key but not the salt cannot invert the
    * noise); the registered query pins salt = 0 so the oracle can
    * replay the draw (the RNG-portability contract of
    * `stats_bootstrap`) — an UNSALTED release is an eval artifact, not
    * a private one. `true_cnt` is likewise emitted for the correctness
    * gate; a real DP release drops it and keeps only `released_cnt`
    * (noisy, clamped at zero).
    *
    * Scale shape: one partial-aggregating count over the fact side,
    * then a broadcast join against the bounded dim — noise is a narrow
    * integer CASE over the 25-row aggregate, zero extra passes.
    */
  def dpNoisyCounts(customer: DataFrame, nation: DataFrame,
      salt: Long = 0L): DataFrame = {
    require(salt >= 0L, "salt must be non-negative (u32 hash domain)")
    val h = ((col("n_nationkey").cast("long") + salt) * 2654435761L) %
      4294967296L
    val noise = DpThresholdsU32.zipWithIndex
      .foldRight(lit(DpB.toLong): Column) {
        case ((t, k), els) => when(h < t, lit((k - DpB).toLong)).otherwise(els)
      }
    customer
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("true_cnt"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("true_cnt"), noise.as("noise"))
      .withColumn("noisy_cnt", col("true_cnt") + col("noise"))
      .withColumn("released_cnt", greatest(lit(0L), col("noisy_cnt")))
  }

  /** RANDOMIZED RESPONSE (Warner 1965) — the LOCAL-DP companion of
    * [[dpNoisyCounts]]'s central-DP release: each customer reports a
    * sensitive binary flag (account balance in the red) TRUTHFULLY with
    * probability p = 3/4 and FLIPPED with probability 1/4, so no single
    * report reveals the truth (ε = ln 3 per report), yet the population
    * rate debiasses exactly: with p = 3/4,
    * `n̂_yes = (obs − n/4) / (1/2) = (4·obs − n) / 2` — an exact
    * integer numerator and ONE division.
    *
    * The flip draw is the portable Knuth hash of `c_custkey + salt`
    * against the u32 quarter-point — deterministic and replayable, the
    * same salt-0-for-the-oracle / fresh-salt-in-production contract as
    * [[dpNoisyCounts]] (and as there, `true_yes` is emitted for the
    * correctness gate only; a real release keeps `obs_yes`/`est_yes`).
    *
    * Scale shape: one narrow per-row flip + one partial-merging
    * aggregate per nation, broadcast dim join — the dpNoisyCounts plan
    * with the noise moved from the aggregate to the rows, which is
    * exactly the central-vs-local DP distinction.
    */
  def randomizedResponse(customer: DataFrame, nation: DataFrame,
      salt: Long = 0L): DataFrame = {
    require(salt >= 0L, "salt must be non-negative (u32 hash domain)")
    val h = ((col("c_custkey") + salt) * 2654435761L) % 4294967296L
    val flip = h < 1073741824L // 2^30 = quarter of the u32 range
    val truth = col("c_acctbal") < 0.0
    customer
      .select(col("c_nationkey"),
        when(truth, 1L).otherwise(0L).as("y"),
        when(flip, when(truth, 0L).otherwise(1L))
          .otherwise(when(truth, 1L).otherwise(0L)).as("r"))
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n"), sum("y").as("true_yes"),
        sum("r").as("obs_yes"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("n"), col("true_yes"), col("obs_yes"),
        ((lit(4L) * col("obs_yes") - col("n")).cast("double") / lit(2.0))
          .as("est_yes"))
  }

  /** Simulated deletion-request predicate for the registered erasure
    * query: every 97th customer key — a deterministic stand-in for the
    * DSR list a real deployment reads from its requests table.
    */
  val ErasureKeyModulus = 97L

  /** RIGHT-TO-ERASURE CASCADE AUDIT (GDPR Art. 17 / CCPA delete) — the
    * release-side twin of the k-anon/l-div audits: given a
    * deletion-request key list, how many rows leave EACH table once the
    * delete propagates through the FK graph (customer → their orders →
    * those orders' lineitems)? One audit row per table with
    * before/deleted/after counts; the retained relations are the
    * LEFT ANTI complements of the semi-joins counted here.
    *
    * Scale shape: the request list is tiny next to the corpus, so it
    * BROADCASTS into the customer/orders semi-joins; the second hop
    * (lineitems of deleted orders) semi-joins on the deleted-order
    * keys, which are request-proportional. Every count is a
    * partial-merging aggregate; output is tables-sized.
    */
  def erasureAudit(customer: DataFrame, orders: DataFrame,
      lineitem: DataFrame): DataFrame = {
    val keys = customer
      .filter(col("c_custkey") % ErasureKeyModulus === 0)
      .select(col("c_custkey").as("k"))
    // DATA-DEPENDENT broadcast (r17 verdict #4): the request list is
    // customer-proportional (1/ErasureKeyModulus of the dim), not
    // bounded by construction — advisor-gated, one cheap key-column scan
    val keysSide = graft.plans.Layout.advisedBroadcast(keys, fixed = 8L)
    val delCust = customer.join(keysSide,
      col("c_custkey") === col("k"), "left_semi")
    val delOrd = orders.join(keysSide,
      col("o_custkey") === col("k"), "left_semi")
    val delLi = lineitem.join(delOrd.select(col("o_orderkey").as("ok2")),
      col("l_orderkey") === col("ok2"), "left_semi")
    def row(t: String, full: DataFrame, del: DataFrame) =
      full.agg(count(lit(1)).as("rows_before"))
        .crossJoin(broadcast(del.agg(count(lit(1)).as("rows_deleted"))))
        .select(lit(t).as("table_name"), col("rows_before"),
          col("rows_deleted"),
          (col("rows_before") - col("rows_deleted")).as("rows_after"))
    row("customer", customer, delCust)
      .unionAll(row("orders", orders, delOrd))
      .unionAll(row("lineitem", lineitem, delLi))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "privacy_erasure" -> ((s, d) => erasureAudit(Tables.customer(s, d),
      Tables.orders(s, d), Tables.lineitem(s, d))),
    "privacy_dp_counts" -> ((s, d) =>
      dpNoisyCounts(Tables.customer(s, d), Tables.nation(s, d))),
    "tclose_audit" -> ((s, d) => tClosenessAudit(Tables.customer(s, d))),
    "privacy_rr" -> ((s, d) => randomizedResponse(Tables.customer(s, d),
      Tables.nation(s, d))),
    "pii_redact_text" -> ((s, d) => redactDocuments(Tables.documents(s, d))),
    "pii_mask_customers" -> ((s, d) => maskCustomers(Tables.customer(s, d))),
    "kanon_audit" -> ((s, d) => kAnonymityAudit(Tables.customer(s, d))),
    "ldiv_audit" -> ((s, d) => lDiversityAudit(Tables.customer(s, d))),
  )

  /** DuckDB twins — same regexes (shared Java/RE2 subset), same plant. */
  def oracleSql: Map[String, String] = Map(
    "privacy_rr" ->
      """WITH f AS (
        |  SELECT c_nationkey,
        |         CASE WHEN c_acctbal < 0.0 THEN 1 ELSE 0 END AS y,
        |         CASE WHEN (c_custkey * 2654435761) % 4294967296
        |                   < 1073741824
        |              THEN CASE WHEN c_acctbal < 0.0 THEN 0 ELSE 1 END
        |              ELSE CASE WHEN c_acctbal < 0.0 THEN 1 ELSE 0 END
        |         END AS r
        |  FROM customer),
        |a AS (
        |  SELECT c_nationkey, count(*) AS n,
        |         CAST(sum(y) AS BIGINT) AS true_yes,
        |         CAST(sum(r) AS BIGINT) AS obs_yes
        |  FROM f GROUP BY 1)
        |SELECT n_name, n, true_yes, obs_yes,
        |       CAST(4 * obs_yes - n AS DOUBLE) / 2.0 AS est_yes
        |FROM a JOIN nation ON c_nationkey = n_nationkey""".stripMargin,
    "privacy_erasure" ->
      s"""WITH ks AS (
         |  SELECT c_custkey FROM customer
         |  WHERE c_custkey % $ErasureKeyModulus = 0),
         |del_ord AS (
         |  SELECT o_orderkey FROM orders
         |  WHERE o_custkey IN (SELECT c_custkey FROM ks))
         |SELECT 'customer' AS table_name,
         |       (SELECT count(*) FROM customer) AS rows_before,
         |       (SELECT count(*) FROM ks) AS rows_deleted,
         |       (SELECT count(*) FROM customer) -
         |         (SELECT count(*) FROM ks) AS rows_after
         |UNION ALL
         |SELECT 'orders',
         |       (SELECT count(*) FROM orders),
         |       (SELECT count(*) FROM del_ord),
         |       (SELECT count(*) FROM orders) -
         |         (SELECT count(*) FROM del_ord)
         |UNION ALL
         |SELECT 'lineitem',
         |       (SELECT count(*) FROM lineitem),
         |       (SELECT count(*) FROM lineitem
         |        WHERE l_orderkey IN (SELECT o_orderkey FROM del_ord)),
         |       (SELECT count(*) FROM lineitem) -
         |         (SELECT count(*) FROM lineitem
         |          WHERE l_orderkey IN (SELECT o_orderkey FROM del_ord))"""
        .stripMargin,
    "privacy_dp_counts" -> {
      val cases = DpThresholdsU32.zipWithIndex
        .map { case (t, k) => s"WHEN u < $t THEN ${k - DpB}" }.mkString(" ")
      s"""WITH g AS (
         |  SELECT c_nationkey, count(*) AS true_cnt
         |  FROM customer GROUP BY 1),
         |j AS (
         |  SELECT n.n_name, g.true_cnt,
         |         (n.n_nationkey * 2654435761) % 4294967296 AS u
         |  FROM g JOIN nation n ON g.c_nationkey = n.n_nationkey),
         |d AS (
         |  SELECT n_name, true_cnt,
         |         CAST(CASE $cases ELSE $DpB END AS BIGINT) AS noise
         |  FROM j)
         |SELECT n_name, true_cnt, noise,
         |       true_cnt + noise AS noisy_cnt,
         |       greatest(0, true_cnt + noise) AS released_cnt
         |FROM d""".stripMargin
    },
    "tclose_audit" ->
      """WITH bkt AS (
        |  SELECT c_mktsegment, c_nationkey,
        |         CAST(floor(c_acctbal / 1000) AS BIGINT) AS b
        |  FROM customer),
        |g AS (SELECT b, count(*) AS g_cnt FROM bkt GROUP BY 1),
        |t AS (SELECT CAST(sum(g_cnt) AS BIGINT) AS n_total,
        |             count(*) AS m_buckets FROM g),
        |cc AS (SELECT c_mktsegment, c_nationkey, b, count(*) AS cnt
        |       FROM bkt GROUP BY 1, 2, 3),
        |cls AS (SELECT c_mktsegment, c_nationkey,
        |               CAST(sum(cnt) AS BIGINT) AS class_size
        |        FROM cc GROUP BY 1, 2),
        |dom AS (
        |  SELECT cls.c_mktsegment, cls.c_nationkey, cls.class_size,
        |         g.b, g.g_cnt, COALESCE(cc.cnt, 0) AS cnt
        |  FROM cls CROSS JOIN g
        |  LEFT JOIN cc ON cc.c_mktsegment = cls.c_mktsegment
        |              AND cc.c_nationkey = cls.c_nationkey AND cc.b = g.b),
        |cum AS (
        |  SELECT dom.*, t.m_buckets, t.n_total,
        |         CAST(sum(dom.cnt * t.n_total - dom.g_cnt * dom.class_size)
        |              OVER (PARTITION BY dom.c_mktsegment, dom.c_nationkey
        |                    ORDER BY dom.b) AS BIGINT) AS cum
        |  FROM dom, t),
        |agg AS (
        |  SELECT c_mktsegment, c_nationkey, class_size, m_buckets, n_total,
        |         CAST(sum(abs(cum)) AS BIGINT) AS emd_scaled
        |  FROM cum GROUP BY 1, 2, 3, 4, 5),
        |f AS (
        |  SELECT c_mktsegment, c_nationkey, class_size, emd_scaled,
        |         CAST(emd_scaled AS DOUBLE) /
        |           (CAST(m_buckets - 1 AS DOUBLE) * CAST(class_size AS DOUBLE)
        |             * CAST(n_total AS DOUBLE)) AS emd
        |  FROM agg)
        |SELECT *, emd > 0.15 AS above_bar FROM f""".stripMargin,
    "ldiv_audit" ->
      """WITH cls AS (
        |  SELECT c_mktsegment, c_nationkey,
        |         count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT))
        |           AS l_div,
        |         count(*) AS class_size
        |  FROM customer GROUP BY 1, 2),
        |t AS (SELECT count(*) AS n_total FROM customer),
        |r AS (
        |  SELECT CAST(l_div AS BIGINT) AS l_div, count(*) AS n_classes,
        |         CAST(sum(class_size) AS BIGINT) AS n_rows
        |  FROM cls GROUP BY 1)
        |SELECT r.l_div, r.n_classes, r.n_rows,
        |       CAST(r.n_rows AS DOUBLE) / t.n_total AS row_share,
        |       r.l_div < 3 AS below_bar
        |FROM r, t""".stripMargin,
    "kanon_audit" ->
      """WITH cls AS (
        |  SELECT c_mktsegment, c_nationkey,
        |         CAST(floor(c_acctbal / 1000) AS BIGINT) AS acctbal_bucket,
        |         count(*) AS class_size
        |  FROM customer GROUP BY 1, 2, 3),
        |tot AS (SELECT count(*) AS n_total FROM customer)
        |SELECT class_size,
        |       count(*) AS n_classes,
        |       CAST(class_size * count(*) AS BIGINT) AS n_rows,
        |       CAST(class_size * count(*) AS DOUBLE) / n_total AS row_share
        |FROM cls, tot
        |GROUP BY class_size, n_total""".stripMargin,
    "pii_redact_text" ->
      """WITH planted AS (
        |  SELECT doc_id,
        |         text || ' contact user' || CAST(doc_id AS VARCHAR)
        |              || '@mail.example.com or call 555-'
        |              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |              || ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
        |              || '.0.' || CAST((doc_id * 7) % 256 AS VARCHAR) AS text
        |  FROM documents),
        |red AS (
        |  SELECT doc_id,
        |         len(regexp_extract_all(text,
        |           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        |           AS n_emails,
        |         len(regexp_extract_all(text, '\b\d{3}-\d{4}\b')) AS n_phones,
        |         len(regexp_extract_all(text,
        |           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ips,
        |         regexp_replace(
        |           regexp_replace(
        |             regexp_replace(text,
        |               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |               '<EMAIL>', 'g'),
        |             '\b\d{3}-\d{4}\b', '<PHONE>', 'g'),
        |           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')
        |           AS text
        |  FROM planted)
        |SELECT doc_id, n_emails, n_phones, n_ips,
        |       md5(text) AS redacted_fp,
        |       length(text) AS n_chars_redacted
        |FROM red""".stripMargin,
    "pii_mask_customers" ->
      """SELECT c_custkey,
        |       sha256(c_name) AS name_hash,
        |       regexp_replace(substring(c_name, 1, length(c_name) - 4),
        |                      '[0-9]', 'X', 'g')
        |         || substring(c_name, length(c_name) - 3, 4)
        |         AS name_masked,
        |       CAST(floor(c_acctbal / 1000) AS BIGINT) AS acctbal_bucket,
        |       c_mktsegment
        |FROM customer""".stripMargin,
  )
}

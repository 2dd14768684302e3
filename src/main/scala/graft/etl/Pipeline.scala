package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Bronze

/** End-to-end medallion pipeline — the reference's Airflow DAG collapsed
  * into in-process composition (SURVEY.md §2.10 O1-O4): bronze (parquet
  * at rest) → silver (cleansed) → gold (analytics), executed sequentially
  * in ONE SparkSession, followed by REAL validation (the reference's
  * validation task is an `echo` stub, reference `dags/dag.py:73-77`, and
  * every stage swallows its own failures via try/except print —
  * `to_bronze.py:52-53` — which this pipeline deliberately does not:
  * failures propagate).
  *
  * Scale note: stages communicate through parquet paths, not driver
  * memory; each stage is an independent Spark job graph, so a scheduler
  * can retry any stage idempotently (overwrite semantics).
  */
object Pipeline {

  case class StageResult(zone: String, table: String, rows: Long,
      path: String)

  /** Silver zone: cleansed tables written to `$outDir/silver/<t>`. */
  def runSilver(spark: SparkSession, sfDir: String,
      outDir: String): Seq[StageResult] = {
    val stages: Seq[(String, DataFrame)] = Seq(
      "orders"   -> Silver.orders(spark, sfDir),
      "customer" -> Silver.customer(spark, sfDir),
      "lineitem" -> Silver.lineitem(spark, sfDir),
      "part"     -> Silver.part(spark, sfDir),
      "supplier" -> Silver.supplier(spark, sfDir),
      "events"   -> Silver.events(spark, sfDir))
    stages.map { case (name, df) =>
      val path = s"$outDir/silver/$name"
      Bronze.writeParquet(df, path)
      StageResult("silver", name, spark.read.parquet(path).count(), path)
    }
  }

  /** Gold zone: analytics tables written to `$outDir/gold/<t>`. */
  def runGold(spark: SparkSession, sfDir: String,
      outDir: String): Seq[StageResult] = {
    val stages: Seq[(String, DataFrame)] = Seq(
      "daily_sales"          -> Gold.dailySales(spark, sfDir),
      "customer_metrics"     -> Gold.customerMetrics(spark, sfDir),
      "product_performance"  -> Gold.productPerformance(spark, sfDir),
      "seller_performance"   -> Gold.sellerPerformance(spark, sfDir),
      "satisfaction_metrics" -> Gold.satisfactionMetrics(spark, sfDir),
      "delivery_performance" -> Gold.deliveryPerformance(spark, sfDir))
    stages.map { case (name, df) =>
      val path = s"$outDir/gold/$name"
      Bronze.writeParquet(df, path)
      StageResult("gold", name, spark.read.parquet(path).count(), path)
    }
  }

  case class CheckResult(zone: String, table: String, check: String,
      passed: Boolean, detail: String)

  /** REAL validation (replaces the reference's echo stub): non-emptiness,
    * primary-key uniqueness, and non-null key constraints per zone.
    */
  def validate(spark: SparkSession, outDir: String): Seq[CheckResult] = {
    val keys = Map(
      ("silver", "orders")   -> "o_orderkey",
      ("silver", "customer") -> "c_custkey",
      ("silver", "part")     -> "p_partkey",
      ("silver", "supplier") -> "s_suppkey",
      ("silver", "events")   -> "event_id")
    val zones = Seq("silver", "gold")
    zones.flatMap { zone =>
      val base = new java.io.File(s"$outDir/$zone")
      base.listFiles().toSeq.sortBy(_.getName).flatMap { dir =>
        val table = dir.getName
        val df = spark.read.parquet(dir.getPath)
        val n = df.count()
        val nonEmpty = CheckResult(zone, table, "non_empty", n > 0, s"rows=$n")
        val keyChecks = keys.get((zone, table)).toSeq.flatMap { k =>
          val distinct = df.select(k).distinct().count()
          val nulls = df.filter(col(k).isNull).count()
          Seq(
            CheckResult(zone, table, s"pk_unique($k)", distinct == n,
              s"distinct=$distinct rows=$n"),
            CheckResult(zone, table, s"pk_not_null($k)", nulls == 0,
              s"nulls=$nulls"))
        }
        nonEmpty +: keyChecks
      }
    }
  }

  /** Full run: silver → gold → validate; throws if any check fails. */
  def runAll(spark: SparkSession, sfDir: String,
      outDir: String): Seq[CheckResult] = {
    runSilver(spark, sfDir, outDir)
    runGold(spark, sfDir, outDir)
    val checks = validate(spark, outDir)
    val failed = checks.filterNot(_.passed)
    require(failed.isEmpty,
      s"validation failed: ${failed.map(c => s"${c.table}/${c.check}").mkString(", ")}")
    checks
  }

  /** Reference-parity run with an external DATABASE as every zone's
    * store (the reference keeps bronze/silver/gold in Postgres and each
    * task reads the previous zone back from the DB, reference
    * `to_bronze.py:41-50`, `to_silver.py:22-42`, `to_gold.py:36-45`):
    * raw parquet → `bronze_<t>` → `silver_<t>` → `gold_<t>`, every hop
    * through [[Bronze.writeJdbc]] / a JDBC read of the PREVIOUS zone —
    * no stage touches the parquet fixtures after bronze.
    *
    * The gold stages consume raw-SHAPE tables (this engine's registered,
    * oracle-verified gold surface — like the reference's `to_gold`
    * SELECTing the untransformed columns), so they read the bronze zone
    * back from the DB; the silver zone is materialized and validated
    * through the DB alongside. PipelineSpec asserts every DB gold table
    * is value-identical to the parquet-path gold — the storage-fidelity
    * proof (timestamps, doubles, strings survive the JDBC round-trip).
    *
    * Returns the gold table names written (prefixed `gold_`).
    */
  def runAllJdbc(spark: SparkSession, sfDir: String,
      url: String): Seq[String] = {
    import graft.Tables
    val raw: Seq[(String, DataFrame)] = Seq(
      "orders"   -> Tables.orders(spark, sfDir),
      "customer" -> Tables.customer(spark, sfDir),
      "lineitem" -> Tables.lineitem(spark, sfDir),
      "part"     -> Tables.part(spark, sfDir),
      "supplier" -> Tables.supplier(spark, sfDir),
      "nation"   -> Tables.nation(spark, sfDir),
      "events"   -> Tables.events(spark, sfDir))
    raw.foreach { case (n, df) => Bronze.writeJdbc(df, url, s"bronze_$n") }
    def zone(z: String, n: String): DataFrame =
      spark.read.format("jdbc").option("url", url)
        .option("dbtable", s"${z}_$n").load()
    val silver: Seq[(String, DataFrame)] = Seq(
      "orders"   -> Silver.ordersStage(zone("bronze", "orders")),
      "customer" -> Silver.customerStage(zone("bronze", "customer")),
      "lineitem" -> Silver.lineitemStage(zone("bronze", "lineitem")),
      "part"     -> Silver.partStage(zone("bronze", "part"),
        zone("bronze", "nation")),
      "supplier" -> Silver.supplierStage(zone("bronze", "supplier")),
      "events"   -> Silver.eventsStage(zone("bronze", "events")))
    silver.foreach { case (n, df) => Bronze.writeJdbc(df, url, s"silver_$n") }
    val gold: Seq[(String, DataFrame)] = Seq(
      "daily_sales" -> Gold.dailySalesStage(
        zone("bronze", "lineitem"), zone("bronze", "orders")),
      "customer_metrics" -> Gold.customerMetricsStage(
        zone("bronze", "lineitem"), zone("bronze", "orders"),
        zone("bronze", "customer")),
      "product_performance" -> Gold.productPerformanceStage(
        zone("bronze", "lineitem"), zone("bronze", "part")),
      "seller_performance" -> Gold.sellerPerformanceStage(
        zone("bronze", "lineitem"), zone("bronze", "supplier"),
        zone("bronze", "orders")),
      "satisfaction_metrics" -> Gold.satisfactionMetricsStage(
        zone("bronze", "events")),
      "delivery_performance" -> Gold.deliveryPerformanceStage(
        zone("bronze", "lineitem"), zone("bronze", "orders")))
    gold.foreach { case (n, df) => Bronze.writeJdbc(df, url, s"gold_$n") }
    gold.map { case (n, _) => s"gold_$n" }
  }
}

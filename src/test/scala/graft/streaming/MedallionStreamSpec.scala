package graft.streaming

import graft.SparkSpec
import graft.etl.Silver
import org.apache.spark.sql.DataFrame

/** The incremental-medallion parity contract (VERDICT r18 #6): N
  * micro-batched runs, one-batch runs, and the direct batch compose must
  * all produce the identical gold table, and the checkpointed stream must
  * process only the delta on resume (proven by deleting already-committed
  * source files before resuming).
  */
class MedallionStreamSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def orders = graft.Tables.orders(spark, sfDir)
  private def li = graft.Tables.lineitem(spark, sfDir)

  /** Row-set fingerprint for exact parity: every column is exact (longs,
    * strings, cents-derived doubles), so plain row equality is the right
    * comparison.
    */
  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  private def goldOf(work: java.nio.file.Path): DataFrame =
    spark.read.parquet(s"$work/gold_daily_sales")

  private def batchCompose(ord: DataFrame): DataFrame =
    MedallionStream.dailySalesFromSilver(li, Silver.ordersStage(ord))

  test("N micro-batches == one batch == direct batch compose") {
    val src = java.nio.file.Files.createTempDirectory("graft_med_src")
    orders.repartition(3).write.mode("overwrite").parquet(src.toString)

    val workN = java.nio.file.Files.createTempDirectory("graft_med_n")
    MedallionStream.runAvailableNow(spark, src.toString, li,
      workN.toString, maxFilesPerTrigger = 1)

    val work1 = java.nio.file.Files.createTempDirectory("graft_med_1")
    MedallionStream.runAvailableNow(spark, src.toString, li,
      work1.toString, maxFilesPerTrigger = 1000)

    val expected = rows(batchCompose(orders))
    assert(expected.nonEmpty)
    assert(rows(goldOf(workN)) === expected)
    assert(rows(goldOf(work1)) === expected)
    // and silver converged to the deduped batch stage on both paths
    assert(spark.read.parquet(s"$workN/silver_orders").count() ===
      Silver.ordersStage(orders).count())
  }

  test("checkpoint resume processes ONLY the delta (committed source " +
      "files can vanish; their rows live on in the snapshot)") {
    val src = java.nio.file.Files.createTempDirectory("graft_med_src2")
    val work = java.nio.file.Files.createTempDirectory("graft_med_w2")
    val half1 = orders.filter("o_orderkey % 2 = 0")
    val half2 = orders.filter("o_orderkey % 2 = 1")

    half1.coalesce(1).write.mode("append").parquet(src.toString)
    MedallionStream.runAvailableNow(spark, src.toString, li, work.toString)
    val afterFirst = spark.read.parquet(s"$work/silver_orders").count()
    assert(afterFirst === Silver.ordersStage(half1).count())

    // delete the already-committed part files: a resume that re-read the
    // source from scratch would lose these rows; the checkpointed file
    // index + keyed snapshot must not
    val dir = new java.io.File(src.toString)
    dir.listFiles().filter(_.getName.endsWith(".parquet"))
      .foreach(f => assert(f.delete()))
    half2.coalesce(1).write.mode("append").parquet(src.toString)
    MedallionStream.runAvailableNow(spark, src.toString, li, work.toString)

    assert(rows(goldOf(work)) === rows(batchCompose(orders)))
  }

  test("crash between silver swap and gold swap: next epoch repairs gold " +
      "(gold is a function of the snapshot, not the delta)") {
    val work = java.nio.file.Files.createTempDirectory("graft_med_w3")
    val silverPath = s"$work/silver_orders"
    val goldPath = s"$work/gold_daily_sales"
    val b1 = orders.filter("o_orderkey % 3 = 0")
    val b2 = orders.filter("o_orderkey % 3 = 1")
    val b3 = orders.filter("o_orderkey % 3 = 2")

    MedallionStream.applyEpoch(b1, li, silverPath, goldPath)
    // simulated crash mid-epoch-2: silver committed, gold swap never ran
    UpsertSink.applyBatch(Silver.ordersStage(b2), silverPath,
      Seq("o_orderkey"))
    assert(rows(goldOf(java.nio.file.Paths.get(work.toString))) ===
      rows(batchCompose(b1))) // gold is stale, by construction
    // epoch 3 repairs: gold recomputed from the full snapshot
    MedallionStream.applyEpoch(b3, li, silverPath, goldPath)
    assert(rows(goldOf(java.nio.file.Paths.get(work.toString))) ===
      rows(batchCompose(orders)))
  }

  test("registered query matches its own oracle shape: re-running from " +
      "scratch is deterministic") {
    val a = rows(MedallionStream.streamMedallion(spark, sfDir))
    val b = rows(MedallionStream.streamMedallion(spark, sfDir))
    assert(a === b)
    assert(a === rows(batchCompose(orders)))
  }
}

package graft.etl

import graft.SparkSpec
import java.nio.file.Files

class PipelineSpec extends SparkSpec {

  test("full medallion run on sf0.001: all stages written, checks pass") {
    val out = Files.createTempDirectory("graft_pipe").toString
    val checks = Pipeline.runAll(spark, "/root/testdata/sf0.001", out)
    assert(checks.nonEmpty)
    assert(checks.forall(_.passed))
    // 6 silver + 6 gold non-empty checks plus key checks
    assert(checks.count(_.check == "non_empty") === 12)
    assert(checks.count(_.check.startsWith("pk_unique")) === 5)
  }

  test("reference-parity JDBC medallion: bronze->silver->gold entirely " +
      "through an embedded Derby store; gold equals the parquet-path gold") {
    val sf = "/root/testdata/sf0.001"
    val dbDir = Files.createTempDirectory("graft_pipe_derby").toString
    val url = s"jdbc:derby:$dbDir/graftdb;create=true"
    val goldTables = Pipeline.runAllJdbc(spark, sf, url)
    assert(goldTables.size === 6)
    // the parquet-path gold (the registered, oracle-verified surface)
    val out = Files.createTempDirectory("graft_pipe_parquet").toString
    val parquetGold = Pipeline.runGold(spark, sf, out)
      .map(r => s"gold_${r.table}" -> r.path).toMap
    def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[String]] =
      df.collect().toSeq
        .map(_.toSeq.map(v => String.valueOf(v)))
        .sortBy(_.mkString(""))
    goldTables.foreach { t =>
      val viaDb = spark.read.format("jdbc").option("url", url)
        .option("dbtable", t).load()
      val viaParquet = spark.read.parquet(parquetGold(t))
      assert(viaDb.columns.toSeq === viaParquet.columns.toSeq,
        s"$t column drift")
      assert(rows(viaDb) === rows(viaParquet), s"$t value drift")
      assert(viaDb.count() > 0, s"$t empty")
    }
    // the silver zone also lives in the DB (the reference's to_silver
    // writes it there) — spot-check one table round-tripped
    val silverOrders = spark.read.format("jdbc").option("url", url)
      .option("dbtable", "silver_orders").load()
    assert(silverOrders.count() ===
      Silver.orders(spark, sf).count())
  }
}

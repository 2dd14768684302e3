package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  test("diff: classifies added / removed / changed and names the columns") {
    val a = Seq((1L, "O", 10.0), (2L, "F", 20.0), (3L, "O", 30.0),
      (4L, "O", 40.0)).toDF("k", "status", "price")
    val b = Seq((1L, "O", 10.0),            // unchanged -> absent
      (2L, "O", 20.0),                      // status changed
      (3L, "O", 33.0),                      // price changed
      (5L, "O", 50.0))                      // new
      .toDF("k", "status", "price")
    val out = SnapshotDiff.diff(a, b, Seq("k"), Seq("status", "price"))
      .collect().map(r => r.getAs[Long]("k") ->
        (r.getAs[String]("diff_status"), r.getAs[String]("changed_cols")))
      .toMap
    assert(out === Map(
      2L -> ("changed", "status"),
      3L -> ("changed", "price"),
      4L -> ("removed", ""),
      5L -> ("added", "")))
  }

  test("diff: NULL -> value and value -> NULL count as changes (null-safe)") {
    val a = Seq((1L, Option("x")), (2L, Option.empty[String]))
      .toDF("k", "v")
    val b = Seq((1L, Option.empty[String]), (2L, Option("y")))
      .toDF("k", "v")
    val out = SnapshotDiff.diff(a, b, Seq("k"), Seq("v"))
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[String]("diff_status"))
      .toMap
    assert(out === Map(1L -> "changed", 2L -> "changed"))
  }

  test("diffOrders over testdata: every class present, counts line up") {
    val orders = graft.Tables.orders(spark, "/root/testdata/sf0.001")
    val out = SnapshotDiff.diffOrders(orders)
    val byClass = out.groupBy("diff_status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val keys = orders.select("o_orderkey").as[Long].collect().toSet
    val added = keys.count(k => k % 10 == 3 && k % 7 != 2)
    val removed = keys.count(k => k % 10 != 3 && k % 7 == 2)
    assert(byClass("added") === added.toLong)
    assert(byClass("removed") === removed.toLong)
    assert(byClass.getOrElse("changed", 0L) > 0L)
    // changed rows name the price column only
    assert(out.filter(col("diff_status") === "changed")
      .filter(col("changed_cols") =!= "o_totalprice").count() === 0L)
  }
}

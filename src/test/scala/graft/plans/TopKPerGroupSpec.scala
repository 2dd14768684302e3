package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

class TopKPerGroupSpec extends SparkSpec {
  import spark.implicits._

  test("heap top-k equals window row_number top-k on real data") {
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.01")
    // (l_orderkey, l_linenumber) tie-breaks make both kept sets unique —
    // a price tie at the k boundary is otherwise nondeterministic
    val got = TopKPerGroup(li, Seq("l_returnflag"),
      Seq("l_extendedprice" -> true, "l_orderkey" -> false,
        "l_linenumber" -> false), k = 7)
      .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
      .as[(String, Long, Int, Double)].collect().toSet
    val w = Window.partitionBy("l_returnflag")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
        col("l_linenumber"))
    val want = li.withColumn("rn", row_number().over(w)).filter($"rn" <= 7)
      .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
      .as[(String, Long, Int, Double)].collect().toSet
    assert(got === want)
  }

  test("ascending k smallest works and the custom exec is in the plan") {
    val df = (1 to 100).map(i => (i % 3, i)).toDF("g", "v")
    val q = TopKPerGroup(df, Seq("g"), "v", k = 2, desc = false)
    assert(q.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
    val got = q.as[(Int, Int)].collect().toSet
    assert(got === Set((0, 3), (0, 6), (1, 1), (1, 4), (2, 2), (2, 5)))
  }

  test("groups smaller than k pass through whole") {
    val df = Seq((1, 10), (1, 20), (2, 5)).toDF("g", "v")
    val got = TopKPerGroup(df, Seq("g"), "v", k = 5)
      .as[(Int, Int)].collect().toSet
    assert(got === Set((1, 10), (1, 20), (2, 5)))
  }
}

package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("frequent == exact groupBy/having on a skewed stream, regardless " +
      "of partitioning") {
    // 10k items: "hot" 30%, "warm" 5%, long tail of singletons
    val items = (Seq.fill(3000)("hot") ++ Seq.fill(500)("warm") ++
      (0 until 6500).map(i => s"t$i"))
    Seq(1, 4, 13).foreach { parts =>
      val df = spark.sparkContext.parallelize(items, parts).toDF("item")
      val got = HeavyHitters.frequent(df, minFrac = 0.04, slots = 64)
        .select("item", "cnt").as[(String, Long)].collect().toSet
      assert(got === Set(("hot", 3000L), ("warm", 500L)),
        s"with $parts partitions")
    }
  }

  test("threshold boundary: an item exactly AT ceil(minFrac*total) is kept") {
    // total 100, minFrac 0.05 -> ceil = 5; "edge" has exactly 5
    val items = Seq.fill(5)("edge") ++ (0 until 95).map(i => s"u$i")
    val df = items.toDF("item")
    val got = HeavyHitters.frequent(df, 0.05, slots = 200)
      .select("item").as[String].collect().toSet
    assert(got.contains("edge"))
  }

  test("frac is the exact IEEE division of exact counts") {
    val df = (Seq.fill(10)("x") ++ Seq.fill(30)("y")).toDF("item")
    val got = HeavyHitters.frequent(df, 0.2, slots = 8)
      .select("item", "frac").as[(String, Double)].collect().toMap
    assert(got("x") === 10.0 / 40 && got("y") === 30.0 / 40)
  }

  test("under-provisioned slots are rejected loudly") {
    val df = Seq("a").toDF("item")
    val ex = intercept[IllegalArgumentException] {
      HeavyHitters.frequent(df, 0.001, slots = 10)
    }
    assert(ex.getMessage.contains("Misra-Gries"))
  }

  test("frequentTokens over testdata matches brute force") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val got = HeavyHitters.frequentTokens(docs, 0.002)
      .select("token", "cnt").as[(String, Long)].collect().toSet
    val tok = docs.select(explode(split(col("text"), " ")).as("token"))
    val total = tok.count()
    val want = tok.groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= math.ceil(0.002 * total))
      .as[(String, Long)].collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
  }
}

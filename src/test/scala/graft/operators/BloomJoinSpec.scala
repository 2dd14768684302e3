package graft.operators

import graft.SparkSpec
import graft.functions.Bloom
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("Bloom: no false negatives ever; fp rate near the configured target") {
    val n = 5000L
    val bits = Bloom.optimalNumBits(n, 0.01)
    val k = Bloom.optimalNumHashes(bits, n)
    val members = spark.range(0, n).as[Long]
    val filter = Bloom.build(members, bits, k)
    // every inserted key must probe true
    val misses = members.toDF("key")
      .filter(!Bloom.mightContain(filter, col("key")))
      .count()
    assert(misses === 0L, "bloom filters must have no false negatives")
    // non-members: fp rate should be within ~3x of the 1% target
    val probes = 20000L
    val fps = spark.range(n, n + probes).toDF("key")
      .filter(Bloom.mightContain(filter, col("key")))
      .count()
    assert(fps.toDouble / probes < 0.03,
      s"fp rate ${fps.toDouble / probes} far above the 1% target")
  }

  test("interpreted eval matches codegen") {
    val filter = {
      val bits = Bloom.optimalNumBits(100, 0.01)
      Bloom.build(spark.range(0, 100).as[Long], bits,
        Bloom.optimalNumHashes(bits, 100))
    }
    val (k, words) = Bloom.deserialize(filter)
    (0L until 200L).foreach { key =>
      val direct = Bloom.contains(words, words.length * 64, k, key)
      if (key < 100) assert(direct, s"member $key missing")
    }
  }

  test("bloomPrunedJoin is row-identical to the plain join") {
    val fact = spark.range(0, 10000)
      .select(col("id").as("fk"), (col("id") % 100).as("v"))
    val dim = spark.range(0, 10000).filter(col("id") % 37 === 0)
      .select(col("id").as("dk"), lit("d").as("tag"))
    val pruned = BloomJoin.bloomPrunedJoin(fact, "fk", dim, "dk")
      .select("fk", "v", "dk", "tag")
    val plain = fact.join(dim, col("fk") === col("dk"))
      .select("fk", "v", "dk", "tag")
    assert(pruned.exceptAll(plain).count() === 0L)
    assert(plain.exceptAll(pruned).count() === 0L)
  }

  test("the probe sits in the fact scan stage, before the exchange") {
    val fact = spark.range(0, 1000).select(col("id").as("fk"))
    val dim = spark.range(0, 10).select(col("id").as("dk"))
    val plan = BloomJoin.bloomPrunedJoin(fact, "fk", dim, "dk")
      .queryExecution.executedPlan.toString
    // BloomMightContain must appear (the filter survived optimization) and
    // the plan must still be a shuffle join (hint respected)
    assert(plan.contains("BloomMightContain") ||
      plan.toLowerCase.contains("bloommightcontain"))
    assert(plan.contains("ShuffledHashJoin") || plan.contains("SortMergeJoin"))
  }

  test("urgentRevenueByReturnFlag over testdata matches the unpruned twin") {
    val sf = "/root/testdata/sf0.001"
    val li = graft.Tables.lineitem(spark, sf)
    val ord = graft.Tables.orders(spark, sf)
    val got = BloomJoin.urgentRevenueByReturnFlag(li, ord)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    val want = li.join(ord.filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_orderstatus") === "O"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_extendedprice")) * 100).cast("long").as("c"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(got === want)
    assert(got.nonEmpty)
  }
}

package graft.operators

import graft.SparkSpec
import graft.sources.Bronze
import org.apache.spark.sql.functions._

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("asOf: latest right row at-or-before left ts, per key") {
    val left = Seq(
      (1L, 7L, ts("2024-01-10 00:00:00")),
      (2L, 7L, ts("2024-01-20 00:00:00")),
      (3L, 8L, ts("2024-01-05 00:00:00")))  // no order yet -> null
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (7L, ts("2024-01-01 00:00:00"), 100L),
      (7L, ts("2024-01-15 00:00:00"), 101L),
      (8L, ts("2024-01-10 00:00:00"), 200L))
      .toDF("k", "rts", "order_id")
    val out = AsOfJoin.asOf(left, col("user_id"), col("ts"),
        right, col("k"), col("rts"), Seq("order_id"))
      .select("event_id", "order_id").as[(Long, Option[Long])]
      .collect().toMap
    assert(out === Map(1L -> Some(100L), 2L -> Some(101L), 3L -> None))
  }

  test("asOf: equal timestamps match inclusively") {
    val left = Seq((1L, 7L, ts("2024-01-15 00:00:00")))
      .toDF("event_id", "user_id", "ts")
    val right = Seq((7L, ts("2024-01-15 00:00:00"), 42L))
      .toDF("k", "rts", "order_id")
    val out = AsOfJoin.asOf(left, col("user_id"), col("ts"),
      right, col("k"), col("rts"), Seq("order_id")).collect().head
    assert(out.getAs[Long]("order_id") === 42L)
  }

  test("asOfNearest: closer side wins, exact-midpoint ties go backward, " +
      "one-sided rows still match") {
    val left = Seq(
      (1L, 7L, ts("2024-01-04 00:00:00")),  // back 3d vs fwd 11d -> back
      (2L, 7L, ts("2024-01-13 00:00:00")),  // back 12d vs fwd 2d -> fwd
      (3L, 7L, ts("2024-01-08 00:00:00")),  // exact midpoint -> backward
      (4L, 8L, ts("2024-01-05 00:00:00")),  // only a FORWARD candidate
      (5L, 9L, ts("2024-01-05 00:00:00")))  // no candidate -> dropped
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (7L, ts("2024-01-01 00:00:00"), 100L),
      (7L, ts("2024-01-15 00:00:00"), 101L),
      (8L, ts("2024-01-10 00:00:00"), 200L))
      .toDF("k", "rts", "order_id")
    val out = AsOfJoin.asOfNearest(left, col("user_id"), col("ts"),
        right, col("k"), col("rts"), Seq("order_id"))
      .select("event_id", "order_id", "delta_us")
      .as[(Long, Long, Long)].collect()
      .map { case (e, o, d) => e -> ((o, d)) }.toMap
    assert(out === Map(
      1L -> (100L, 3L * 86400 * 1000000L),
      2L -> (101L, 2L * 86400 * 1000000L),
      3L -> (100L, 7L * 86400 * 1000000L),
      4L -> (200L, 5L * 86400 * 1000000L)))
  }

  test("saltedJoin result equals plain join result") {
    val big = (1 to 500).map(i => (if (i % 10 == 0) 1L else i.toLong, s"v$i"))
      .toDF("k", "payload")  // key 1 is hot
    val small = Seq((1L, "dim1"), (2L, "dim2"), (250L, "dim250"))
      .toDF("dk", "name")
    val plain = big.join(small, big("k") === small("dk"))
      .select("k", "payload", "name")
      .as[(Long, String, String)].collect().toSet
    val salted = SkewJoin.saltedJoin(big, small, "k", "dk", col("payload"), 8)
      .select("k", "payload", "name")
      .as[(Long, String, String)].collect().toSet
    assert(salted === plain)
    assert(salted.count(_._1 == 1L) === 51) // i=1 plus every i%10==0
  }

  test("binned range join equals naive range join incl. bin boundaries") {
    val ev = Seq(
      (1L, 7L, ts("2024-01-10 00:00:00")),
      (2L, 7L, ts("2024-01-31 00:00:00")),   // exactly 21d from order 100
      (3L, 7L, ts("2024-02-01 00:00:01")),   // 22d+1s -> out at tol=21
      (4L, 8L, ts("2024-01-10 00:00:00")))   // other user
      .map { case (e, u, t) => (e, t, u, "click", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val ord = Seq(
      (100L, 7L, ts("2024-01-10 00:00:00")),
      (200L, 9L, ts("2024-01-10 00:00:00")))
      .map { case (o, c, t) => (o, c, "F", 1.0, t, "1-URGENT") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val got = RangeJoin.eventsNearOrders(ev, ord, 21)
      .select("event_id", "o_orderkey").as[(Long, Long)].collect().toSet
    // naive reference: every (event, order) of same user within 21 days
    val naive = ev.as("e").join(ord.as("o"),
        col("e.user_id") === col("o.o_custkey") &&
          abs(unix_timestamp(col("e.ts")) -
            unix_timestamp(col("o.o_orderdate"))) <= 21L * 86400)
      .select(col("event_id"), col("o_orderkey"))
      .as[(Long, Long)].collect().toSet
    assert(got === naive)
    assert(got === Set((1L, 100L), (2L, 100L)))
  }

  test("bucketed co-located join has no shuffle exchange") {
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val ord = graft.Tables.orders(spark, "/root/testdata/sf0.001")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    val wh = s"${System.getProperty("java.io.tmpdir")}/graft_warehouse"
    Seq("li_bucketed", "ord_bucketed").foreach { t =>
      val d = new java.io.File(s"$wh/$t")
      if (d.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(d)
      }
    }
    Bronze.writeBucketed(li, "li_bucketed", 8, Seq("l_orderkey"))
    Bronze.writeBucketed(ord, "ord_bucketed", 8, Seq("o_orderkey"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").count()
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange"),
        s"bucketed join should not shuffle:\n$plan")
      assert(j.count() === 3)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
      prevThreshold)
  }
  test("joinExplosionProfile: exact pair prediction, shares, and the " +
      "salt verdict flips at the threshold") {
    import spark.implicits._
    // user 1: 6 rows, user 2: 2, user 3: 1 -> predicted pairs 41;
    // shares 36/41 (salt), 4/41 < 0.1 (no), 1/41 (no)
    val ev = ((1 to 6).map(i => (i.toLong, 1L)) ++
        Seq((7L, 2L), (8L, 2L), (9L, 3L)))
      .map { case (e, u) => (e, u, "view", 1.0, "{}",
        ts("2024-01-01 00:00:00")) }
      .toDF("event_id", "user_id", "event_type", "value", "props", "ts")
    val r = SkewJoin.joinExplosionProfile(ev)
      .select("key", "cnt", "key_pairs", "n_keys", "total_rows",
        "predicted_pairs", "pair_share", "needs_salt")
      .as[(Long, Long, Long, Long, Long, Long, Double, Boolean)]
      .collect().map(x => x._1 -> x).toMap
    assert(r.size === 3)
    r.values.foreach { x =>
      assert(x._4 === 3L && x._5 === 9L && x._6 === 41L)
    }
    assert(r(1L)._3 === 36L && r(1L)._7 === 36.0 / 41 && r(1L)._8)
    assert(r(2L)._3 === 4L && !r(2L)._8)
    assert(r(3L)._3 === 1L && !r(3L)._8)
    // the predicted size IS the self-join size
    val actual = ev.as("a").join(ev.as("b"), "user_id").count()
    assert(actual === 41L)
  }
}

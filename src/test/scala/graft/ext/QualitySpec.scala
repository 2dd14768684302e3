package graft.ext

import graft.SparkSpec

class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("zscoreQuantity: exact per-group standardization from integer sums") {
    // group A: quantities 2, 4, 6 -> mean 4, pop. var ((3*56-144)/9)=8/3
    // group B: quantities 10, 10 -> var 0 -> z = NULL (degenerate group
    // surfaces explicitly, not as an ANSI DIVIDE_BY_ZERO crash)
    val li = Seq(
      (1L, 1, "A", 2.0), (1L, 2, "A", 4.0), (2L, 1, "A", 6.0),
      (3L, 1, "B", 10.0), (3L, 2, "B", 10.0)
    ).toDF("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
    val got = Quality.zscoreQuantity(li)
      .select("l_orderkey", "l_linenumber", "z")
      .as[(Long, Long, Option[Double])].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    val sd = math.sqrt((3.0 * 56 - 12 * 12) / 9.0)
    assert(got((1L, 1L)) === Some((2.0 - 4.0) / sd))
    assert(got((1L, 2L)) === Some((4.0 - 4.0) / sd))
    assert(got((2L, 1L)) === Some((6.0 - 4.0) / sd))
    assert(got((3L, 1L)) === None)
    assert(got((3L, 2L)) === None)
  }

  test("zscoreQuantity plan: stats apply via broadcast join, no " +
      "full-table window") {
    val li = Seq((1L, 1, "A", 2.0), (2L, 1, "B", 3.0))
      .toDF("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
    val plan = Quality.zscoreQuantity(li).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("Window"), plan)
  }
}

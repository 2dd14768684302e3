package graft

import org.apache.spark.sql.SparkSession

/** The extensions hook must install the planner strategy and the
  * SQL-registry function on a fresh session with no per-call
  * registration. The spec injects through `Builder.withExtensions` — the
  * same `SparkSessionExtensions => Unit` entry point the
  * `spark.sql.extensions=graft.GraftExtensions` conf invokes, which the
  * shared test JVM can't exercise directly (that static conf is only
  * read when the SparkContext itself is created).
  */
class GraftExtensionsSpec extends SparkSpec {

  private def withExtensionSession[A](f: SparkSession => A): A = {
    spark // force the shared context up first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .withExtensions(new GraftExtensions())
      .getOrCreate()
    try f(s)
    finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("dot_ff is callable from SQL text") {
    withExtensionSession { s =>
      val d = s.sql(
        """SELECT dot_ff(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
          |              array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)))
          |         AS d""".stripMargin)
        .head().getDouble(0)
      assert(d === 11.0)
    }
  }

  test("TopKPerGroup plans through the injected strategy") {
    withExtensionSession { s =>
      import s.implicits._
      val df = Seq(("a", 3), ("a", 1), ("a", 2), ("b", 9), ("b", 7))
        .toDF("g", "v")
      val top = graft.plans.TopKPerGroup(df, Seq("g"), "v", k = 1)
      assert(top.queryExecution.executedPlan.toString
        .contains("TopKPerGroup"))
      val rows = top.collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      assert(rows === Map("a" -> 3, "b" -> 9))
    }
  }
}

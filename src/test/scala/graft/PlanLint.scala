package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (test scope, not shipped): lints the PHYSICAL plan of every
  * registered query for scale anti-patterns —
  *
  *  - `CartesianProduct`: an unconditioned non-broadcast cross join is
  *    never intentional here (the engine's 1-row stat joins plan as
  *    BroadcastNestedLoopJoin, which is fine and excluded);
  *
  * Usage: sbt "Test/runMain graft.PlanLint [sfDir]"
  * Exits 1 if any query's plan trips the lint, printing the offenders.
  */
object PlanLint {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var bad = List.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct"))
          bad ::= s"$name: CartesianProduct"
      } catch {
        case e: Throwable => bad ::= s"$name: plan failed: ${e.getMessage}"
      }
      CheckpointLease.releaseAll()
    }
    if (bad.nonEmpty) {
      bad.foreach(b => System.err.println(s"[planlint] $b"))
      spark.stop()
      sys.exit(1)
    }
    println(s"[planlint] ${SparkEntry.queries.size} query plans clean")
    spark.stop()
  }
}

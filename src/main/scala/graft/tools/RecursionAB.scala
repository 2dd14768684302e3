package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Dev-only A/B harness for recursiveComponentsSql's batchDepth: builds
  * the near-dup pair graph ONCE, then times the recursion alone at each
  * requested depth (3 reps after warmup) so the comparison excludes the
  * (identical) pair-derivation cost and inter-JVM noise.
  */
object RecursionAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val depths = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
                 else Seq(4, 8, 16, 32)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // collect the (tiny) pair set and re-create a plain DataFrame from it:
    // session hygiene between reps drains checkpoint/cache blocks, so the
    // shared input must not depend on any block store state
    val pairRows = graft.ext.Dedup.ngramJaccardPairs(
        graft.Tables.documents(spark, sfDir))
      .select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    import spark.implicits._
    val edges = pairRows.toDF("doc_a", "doc_b")
    println(s"edges: ${edges.count()}")
    depths.foreach { d =>
      def run(): (Long, Double) = {
        val t0 = System.nanoTime()
        val n = graft.etl.Relational
          .recursiveComponentsSql(spark, edges, batchDepth = d).count()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.CheckpointLease.releaseAll()
        org.apache.spark.sql.GraftBridge.sessionHygiene(spark)
        (n, dt)
      }
      run() // warmup
      val rs = (1 to 3).map(_ => run())
      println(f"DEPTH $d%2d rows=${rs.head._1} " +
        rs.map(r => f"${r._2}%.2f").mkString("times=", ", ", " s"))
    }
    spark.stop()
  }
}

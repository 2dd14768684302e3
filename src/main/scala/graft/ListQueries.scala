package graft

/** Prints the registered query names (one per line) and a final count,
  * plus which have DuckDB oracles. Lets the sweep-before-snapshot rule be
  * checked mechanically: the README/SURVEY counts and the last recorded
  * full sweep must match this output.
  */
object ListQueries {
  def main(args: Array[String]): Unit = {
    val qs = SparkEntry.queries.keys.toSeq.sorted
    val oracles = SparkEntry.oracleSql.keySet
    qs.foreach { n =>
      val tag = if (oracles.contains(n)) "oracle" else "rows-only"
      println(s"$n\t$tag")
    }
    println(s"TOTAL\t${qs.size}\tORACLE\t${qs.count(oracles.contains)}")
    val orphanOracles = oracles.diff(qs.toSet)
    if (orphanOracles.nonEmpty)
      println(s"ORPHAN_ORACLES\t${orphanOracles.toSeq.sorted.mkString(",")}")
  }
}

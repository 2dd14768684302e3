package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.GraftBridge

/** Registry for eagerly `localCheckpoint()`ed DataFrames whose block-manager
  * storage must outlive the builder that created them but NOT the session.
  *
  * Several operators (minhash verify pairs, the recursive-CTE label set)
  * eagerly checkpoint a small intermediate so a large upstream cache can be
  * released before the query function returns. The checkpointed blocks
  * themselves, however, are only reachable through the returned plan's
  * `LogicalRDD`, which `Dataset.unpersist` never touches — in a long-lived
  * session (the bench runs 78 queries twice in one JVM) those blocks
  * accumulate and their memory/GC pressure gets charged to whichever query
  * shuffles hardest next (diagnosed in round 2 as a 7x phantom regression).
  *
  * == Scoping ==
  * Leases land in the SCOPE active when the builder ran. Sequential
  * harnesses (Bench / Verify / TimeQuery) use the default scope and call
  * [[releaseAll]] after each query's consuming action. A caller running
  * queries CONCURRENTLY in one JVM wraps each build in
  * [[scoped]]`("my-query") { ... }` and later calls [[release]]`("my-query")`
  * after its own consuming action — other scopes' leases are untouched, so
  * parallel queries can no longer release each other's blocks (round-3
  * advice). The scope token rides a `DynamicVariable` (inheritable
  * thread-local), so it survives the builder's internal calls without
  * threading a parameter through every operator.
  *
  * Releasing unpins the blocks of a lineage-truncated plan, so a tracked
  * frame must not be acted on again after its scope is released —
  * harnesses that re-run a query rebuild it from its `SparkEntry.queries`
  * function, which re-checkpoints.
  */
object CheckpointLease {

  /** Scope used when no [[scoped]] block is active. */
  val DefaultScope = "default"

  private val tracked =
    scala.collection.mutable.Map
      .empty[String, scala.collection.mutable.ArrayBuffer[DataFrame]]

  private val currentScope =
    new scala.util.DynamicVariable[String](DefaultScope)

  /** Register a checkpointed frame in the active scope; returns it. */
  def track(df: DataFrame): DataFrame = synchronized {
    tracked.getOrElseUpdate(currentScope.value,
      scala.collection.mutable.ArrayBuffer.empty) += df
    df
  }

  /** Run `body` with leases landing in scope `name` (re-entrant; nested
    * scopes shadow). */
  def scoped[A](name: String)(body: => A): A =
    currentScope.withValue(name)(body)

  /** Release the blocks behind every frame tracked in scope `name`. */
  def release(name: String): Unit = synchronized {
    tracked.remove(name).foreach(_.foreach(GraftBridge.unpersistLocalCheckpoint))
  }

  /** Release every scope's tracked frames (idempotent; sequential-harness
    * reset between queries). */
  def releaseAll(): Unit = synchronized {
    tracked.valuesIterator.foreach(_.foreach(GraftBridge.unpersistLocalCheckpoint))
    tracked.clear()
  }

  /** Number of currently-tracked leases across all scopes (spec
    * observability). */
  def size: Int = synchronized(tracked.valuesIterator.map(_.size).sum)
}

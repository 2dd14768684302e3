package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.GraftBridge

/** Whole-operator custom plan (the (c) rung of the extension ladder:
  * LogicalPlan + Strategy + SparkPlan): bounded per-group top-k.
  *
  * The built-in formulation — `row_number() OVER (PARTITION BY g ORDER BY
  * s) <= k` — must SORT every group in full before discarding all but k
  * rows: O(n log n) per group and a full sort buffer. This operator keeps
  * a k-bounded heap per group instead: O(n log k) time, O(groups × k)
  * memory, no sort spill. At 100 TB with heavy groups (millions of rows
  * per group, k = 5) the difference is the whole sort.
  *
  * Physical distribution is declared via `requiredChildDistribution`
  * (ClusteredDistribution on the group keys), so Spark inserts the
  * correct exchange — the operator composes with AQE like any built-in.
  *
  * The strategy is injected per-session through
  * `spark.experimental.extraStrategies` (public API, works on the
  * driver-owned sessions without a SparkSessionExtensions hook).
  */
case class TopKPerGroupPlan(groupExprs: Seq[Expression],
    orders: Seq[SortOrder], k: Int, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupPlan =
    copy(child = newChild)
}

/** Shared per-partition k-bounded-heap pass: keeps the k sort-first rows
  * of every group seen in the partition. Used twice — a PARTIAL pass
  * before the exchange (map-side, like partial aggregation: shuffles at
  * most partitions×groups×k rows instead of the full input) and a FINAL
  * pass after clustering by the group keys.
  */
private object TopKHeap {
  def perPartition(it: Iterator[InternalRow], childOutput: Seq[Attribute],
      groupE: Seq[Expression], ords: Seq[SortOrder],
      kk: Int): Iterator[InternalRow] = {
    val groupProj = UnsafeProjection.create(groupE, childOutput)
    val rowOrd = GenerateOrdering.generate(ords, childOutput)
    // per group: k-bounded heap; rowOrd puts the sort-first ("best")
    // row at compare<0, so the PQ max (head) is the WORST kept row
    val heaps = new java.util.HashMap[UnsafeRow,
      scala.collection.mutable.PriorityQueue[InternalRow]]()
    it.foreach { row =>
      val key = groupProj(row)
      var heap = heaps.get(key)
      if (heap == null) {
        heap = scala.collection.mutable.PriorityQueue.empty(
          rowOrd.asInstanceOf[Ordering[InternalRow]])
        heaps.put(key.copy(), heap)
      }
      if (heap.size < kk) heap.enqueue(row.copy())
      else if (rowOrd.compare(row, heap.head) < 0) {
        heap.dequeue()
        heap.enqueue(row.copy())
      }
    }
    import scala.jdk.CollectionConverters._
    heaps.values().asScala.iterator.flatMap(_.dequeueAll.reverseIterator)
  }
}

/** Map-side partial top-k: no distribution requirement, inherits the
  * child's partitioning. Correct because the global top-k of a group is
  * contained in the union of per-partition top-ks.
  */
case class PartialTopKPerGroupExec(groupExprs: Seq[Expression],
    orders: Seq[SortOrder], k: Int, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val (childOutput, groupE, ords, kk) = (child.output, groupExprs, orders, k)
    child.execute().mapPartitions(
      TopKHeap.perPartition(_, childOutput, groupE, ords, kk))
  }

  override protected def withNewChildInternal(newChild: SparkPlan): PartialTopKPerGroupExec =
    copy(child = newChild)
}

case class TopKPerGroupExec(groupExprs: Seq[Expression],
    orders: Seq[SortOrder], k: Int, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val (childOutput, groupE, ords, kk) = (child.output, groupExprs, orders, k)
    child.execute().mapPartitions(
      TopKHeap.perPartition(_, childOutput, groupE, ords, kk))
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupPlan(g, os, k, child) =>
      // partial (pre-shuffle) + final (post-shuffle), like partial agg:
      // the exchange the final's required distribution inserts only
      // carries each input partition's top-k per group
      TopKPerGroupExec(g, os, k,
        PartialTopKPerGroupExec(g, os, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopKPerGroup {
  /** Bounded top-k rows per group under `orderCol` (desc by default).
    * Columns are given by NAME and resolved against the child's analyzed
    * output directly — Column objects carry unresolved column nodes that
    * the analyzer will not resolve inside a foreign logical node.
    */
  def apply(df: DataFrame, groupCols: Seq[String], orderCol: String,
      k: Int, desc: Boolean = true): DataFrame =
    apply(df, groupCols, Seq(orderCol -> desc), k)

  /** Multi-column variant: (name, descending) pairs; later columns break
    * ties so the kept row set is deterministic.
    */
  def apply(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    }
    val child = df.queryExecution.analyzed
    def attr(n: String): Attribute =
      child.output.find(_.name.equalsIgnoreCase(n)).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not in ${child.output.map(_.name).mkString(",")}"))
    val orders = orderCols.map { case (n, desc) =>
      SortOrder(attr(n), if (desc) Descending else Ascending)
    }
    GraftBridge.ofRows(spark,
      TopKPerGroupPlan(groupCols.map(attr), orders, k, child))
  }
}

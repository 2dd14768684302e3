package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression conversion (the standard
  * pattern for Spark-native extension libraries: Spark 4 wraps Column
  * around ColumnNode, and `classic.ExpressionUtils` is the supported
  * internal conversion point).
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Release the block-manager storage behind a `localCheckpoint()`ed
    * DataFrame once it is superseded. Iterative algorithms leak otherwise:
    * the checkpointed RDD is only reachable through the plan's LogicalRDD,
    * which `Dataset.unpersist` does not touch.
    */
  def unpersistLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: execution.LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
    }
}

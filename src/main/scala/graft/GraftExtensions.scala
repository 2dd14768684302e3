package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.DotProductFF
import graft.plans.TopKStrategy

/** Cluster-installable extension hook — the standard way a Spark-native
  * library ships planner rules and native functions:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * installs, for EVERY session of the application:
  *  - the bounded top-k-per-group planner strategy
  *    ([[graft.plans.TopKStrategy]]) — `TopKPerGroup` DataFrames then plan
  *    without the per-call `experimental.extraStrategies` registration
  *    (which remains as the zero-config fallback);
  *  - `dot_ff(arrayA, arrayB)` in the SQL function registry — the
  *    codegen'd float dot product ([[graft.functions.DotProductFF]])
  *    callable from SQL text, not just the DataFrame DSL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => TopKStrategy)
    ext.injectFunction((
      new FunctionIdentifier("dot_ff"),
      new ExpressionInfo(classOf[DotProductFF].getName, "dot_ff"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "dot_ff takes exactly 2 arguments")
        DotProductFF(children.head, children(1))
      }))
  }
}

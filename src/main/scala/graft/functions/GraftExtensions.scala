package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** `SparkSessionExtensions` installer for the engine's native functions
  * and optimizer rules — the deployment path for clusters
  * (`spark.sql.extensions=graft.functions.GraftExtensions`), making
  * `graft_dot`, `graft_centroid` and the range-join rewrite available on every session
  * without per-session registration ([[VectorExpressions.register]] and
  * `spark.experimental.extraOptimizations` remain for ad-hoc use).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotF32].getName, "graft_dot"),
      (children: Seq[Expression]) => VectorExpressions.dotBuilder(children)))
    ext.injectFunction((
      new FunctionIdentifier("graft_centroid"),
      new ExpressionInfo(classOf[CentroidAggF].getName, "graft_centroid"),
      (children: Seq[Expression]) =>
        VectorExpressions.centroidBuilder(children)))
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
  }
}

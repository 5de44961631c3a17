package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{FirstNWords, FloatDotProduct}

/** Session-extensions installer: wires graft's native pieces into any
  * session at build time via
  * `spark.sql.extensions=graft.plans.GraftExtensions` — the deployment
  * path for clusters. (The operators themselves also self-register at
  * runtime through `spark.experimental` / the FunctionRegistry bridge, so
  * correctness never depends on this conf being set.) */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    e.injectOptimizerRule(_ => PushLimitThroughAsOfJoin)
    e.injectFunction((
      new FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatDotProduct].getName, "float_dot"),
      FloatDotProduct.builder))
    e.injectFunction((
      new FunctionIdentifier("first_n_words"),
      new ExpressionInfo(classOf[FirstNWords].getName, "first_n_words"),
      FirstNWords.builder))
  }
}

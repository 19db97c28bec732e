package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: register graft's native expressions
  * at session build time —
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  * }}}
  *
  * Build-time injection makes `graft_dot` usable from pure SQL strings in
  * any session of the application. [[NativeVectorOps.register]] stays as
  * the runtime path for sessions the library didn't build (the driver
  * contract mains receive an already-built session).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getCanonicalName, "graft_dot"),
      exprs => DotProduct(exprs.head, exprs(1))))
    // optimizer rules (see graft.plans.GraftRules): HOF dot → native
    // codegen loop; size(array_intersect) → count-only intersection
    extensions.injectOptimizerRule(_ => graft.plans.GraftRules.NativeDotRewrite)
    extensions.injectOptimizerRule(_ => graft.plans.GraftRules.IntersectCountRewrite)
  }
}

package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.expressions.GraftFunctions

/** Config-only deployment entry point — the standard way a Spark
  * cluster turns a library on without touching application code:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * Injects, at session build time:
  *  - every native sketch function (the same name → builder table
  *    [[GraftFunctions.register]] uses programmatically), so
  *    `SELECT graft_minhash_sig(text, 16)` works in any SQL client
  *    pointed at the session — including Thrift/Connect frontends
  *    that never run driver-side Scala;
  *  - [[graft.plans.NativeSketchRewrite]] into the optimizer's
  *    extended operator-optimization batch, so the declarative
  *    dot-product fold compiles to [[graft.expressions.TextSketches.VecDot]]
  *    with full fixed-point treatment (the programmatic path's
  *    `experimental.extraOptimizations` batch is once-per-run; the
  *    injected batch is strictly better placed).
  *
  * Both paths stay supported and idempotent together: `register()` on
  * a config-injected session is a no-op (functions exist, rule already
  * in the extended batch).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.NativeSketchRewrite)
  }
}

package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.expressions.TextSketches.VecDot

/** Catalyst optimizer rule: recognize the declarative dot-product fold
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)
  *
  * (optionally with the element-wise double-cast `transform` that
  * [[graft.pipelines.Similarity.dot]] wraps around each side) and replace
  * it with the compiled [[VecDot]] expression. Higher-order-function
  * expressions are interpreted per element; the rewrite makes the
  * DEFINITIONAL form fast everywhere it appears — callers declare the
  * fold, the engine compiles it. Bit-identical by construction: VecDot
  * accumulates in the same ascending-index order with the same null
  * semantics (see the SimilaritySpec exact-equality parity test).
  *
  * Injected per-session through `spark.experimental.extraOptimizations`
  * by [[graft.expressions.GraftFunctions.register]].
  */
object NativeSketchRewrite extends Rule[LogicalPlan] {

  /** Strip the `transform(v, x -> cast(x as double))` wrapper — VecDot
    * widens elements to double itself, identically.
    */
  private def stripDoubleCast(e: Expression): Expression = e match {
    case ArrayTransform(child,
        LambdaFunction(c: Cast, Seq(v: NamedLambdaVariable), _))
        if c.dataType == DoubleType && c.child.semanticEquals(v) =>
      child
    case other => other
  }

  private def isArgRef(e: Expression, arg: NamedExpression): Boolean =
    e match {
      case v: NamedLambdaVariable => v.exprId == arg.exprId
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(mx, my, _), Seq(x, y), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(macc, mv, _), Seq(acc, v), _),
            LambdaFunction(fin, Seq(res), _))
          if isArgRef(mx, x) && isArgRef(my, y) &&
            isArgRef(macc, acc) && isArgRef(mv, v) &&
            isArgRef(fin, res) =>
        VecDot(stripDoubleCast(a), stripDoubleCast(b))
    }
}

package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Expression, LambdaFunction, Literal, Multiply, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.expressions.DotProduct

/** Optimizer rule: rewrite the composable dot-product idiom
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (s, v) -> s + v)
  *
  * into the codegen'd [[DotProduct]] expression. Higher-order functions
  * have no `doGenCode` — they evaluate INTERPRETED, with a lambda
  * dispatch per element and an intermediate array allocation per row
  * (EXPLAIN.md "Higher-order-function expression splicing"; the sf0.1
  * near-dup scan spent ~49 s in exactly this fold before the engine
  * moved to the native expression). DataFrame callers go through
  * [[graft.functions.Native]] and never build the HOF form; this rule
  * catches the `spark.sql(...)` users who write the textbook idiom and
  * hands them the native expression for free — the
  * [[RegexAlternationToContains]] philosophy applied to the similarity
  * hot path.
  *
  * Soundness gates, all load-bearing:
  *  - both arrays must be `array<double>` ([[DotProduct]] poisons to
  *    NULL on a null element exactly like the HOF fold, so
  *    element-nullable schemas — the parquet default — rewrite soundly);
  *  - the zero must be literal `+0.0` matched by RAW BITS (a different
  *    seed is a different fold — left alone; that includes `-0.0`,
  *    which boxed-Double pattern matching would conflate with `0.0`
  *    even though an empty-array fold returns the seed verbatim and
  *    the native expression returns `+0.0` — a signed-zero divergence
  *    the q127 normalization rule exists to prevent);
  *  - lambda bodies must be exactly `x * y` / `s + v` over the lambda's
  *    OWN variables (matched by exprId, either argument order — both
  *    operators are commutative on doubles' sum/product values the fold
  *    produces in left-to-right order either way);
  *  - the finish lambda must be the identity the `aggregate` 3-arg form
  *    synthesizes.
  *
  * Mismatched lengths agree by construction: `zip_with` null-pads the
  * short side (poisoning the sum to NULL) and [[DotProduct]] returns
  * NULL on dimension mismatch.
  */
object HofDotProductToNative extends Rule[LogicalPlan] {

  private def sameVars(l: Expression, r: Expression,
                       args: Seq[NamedLambdaVariable]): Boolean =
    (l, r) match {
      case (a: NamedLambdaVariable, b: NamedLambdaVariable) =>
        Set(a.exprId, b.exprId) == args.map(_.exprId).toSet &&
          a.exprId != b.exprId
      case _ => false
    }

  private def doubles(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
        ZipWith(a, b,
          LambdaFunction(Multiply(mx, my, _), zipArgs, _)),
        seed @ Literal(_: Double, DoubleType),
        LambdaFunction(Add(sx, sy, _), mergeArgs, _),
        LambdaFunction(fin: NamedLambdaVariable, Seq(finArg: NamedLambdaVariable), _))
      if java.lang.Double.doubleToRawLongBits(
          seed.value.asInstanceOf[Double]) == 0L &&
        doubles(a) && doubles(b) &&
        sameVars(mx, my,
          zipArgs.collect { case v: NamedLambdaVariable => v }) &&
        zipArgs.size == 2 &&
        sameVars(sx, sy,
          mergeArgs.collect { case v: NamedLambdaVariable => v }) &&
        mergeArgs.size == 2 &&
        fin.exprId == finArg.exprId =>
      DotProduct(a, b)
  }
}

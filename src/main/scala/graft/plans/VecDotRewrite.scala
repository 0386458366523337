package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Cast, EvalMode, Expression, LambdaFunction, Literal, Multiply, NamedExpression, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.DotProduct

/** Catalyst optimizer rule: rewrite the declarative dot-product shape
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v) }}}
  *
  * (with optional `CAST(... AS DOUBLE)` around the lambda variables) into
  * the codegen'd [[graft.functions.DotProduct]] kernel.  Users keep the
  * ergonomic declarative spelling — ad-hoc SQL, notebooks, the oracle
  * mirrors — and the optimizer swaps in the primitive loop, exactly the
  * trade Catalyst exists to make.  The rewrite is safe because the kernel
  * is bit-identical to the HOF fold by construction (same left-to-right
  * summation; SimilaritySpec) and preserves the NULL algebra (NULL array /
  * NULL element / length mismatch → NULL) — so this is a pure evaluation-
  * strategy change, invisible to results.
  *
  * Wired two ways: `GraftExtensions` injects it for
  * `--conf spark.sql.extensions` deployments, and tests/sessions can add
  * it post-hoc via `spark.experimental.extraOptimizations`.  Matching is
  * deliberately conservative: anything but the exact shape (zero literal
  * 0.0, identity finish, bare or double-cast lambda variables multiplied
  * and left-folded with +) is left untouched.
  */
object VecDotRewrite extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  private def sameVar(e: Expression, v: NamedExpression): Boolean = (e, v) match {
    case (a: NamedLambdaVariable, b: NamedLambdaVariable) => a.exprId == b.exprId
    case _ => false
  }

  /** The lambda variable itself, possibly under double casts. */
  private def castOfVar(e: Expression, v: NamedExpression): Boolean = e match {
    case c: Cast if c.dataType == DoubleType => castOfVar(c.child, v)
    case other => sameVar(other, v)
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b, LambdaFunction(mul: Multiply, Seq(x, y), _)),
            Literal(zero: Double, DoubleType),
            LambdaFunction(add: Add, Seq(acc, v), _),
            LambdaFunction(finishBody, Seq(finishArg), _))
          if zero == 0.0 && isFloatArray(a) && isFloatArray(b) &&
            // Only LEGACY arithmetic: under ANSI mode +/* carry
            // raise-on-overflow semantics the kernel's plain double loop
            // does not reproduce (r6 ADVICE #1).  Double ops can't
            // actually overflow to an error, but the guard keeps the
            // rewrite a pure evaluation-strategy change by construction.
            mul.evalMode == EvalMode.LEGACY &&
            add.evalMode == EvalMode.LEGACY &&
            castOfVar(mul.left, x) && castOfVar(mul.right, y) &&
            sameVar(add.left, acc) && sameVar(add.right, v) &&
            sameVar(finishBody, finishArg) =>
        DotProduct(a, b)
    }
}

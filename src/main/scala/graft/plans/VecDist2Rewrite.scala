package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate,
  EvalMode, Expression, LambdaFunction, Literal, Multiply, NamedExpression,
  NamedLambdaVariable, Subtract, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

import graft.functions.SquaredL2

/** Catalyst optimizer rule: rewrite the declarative squared-L2 shape
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v) }}}
  *
  * over `ARRAY<BIGINT>` into the codegen'd [[graft.functions.SquaredL2]]
  * kernel — the [[VecDotRewrite]] companion for the distance spelling.
  * Safe under LEGACY arithmetic: exact 64-bit integer math has no
  * summation-order contract to preserve (any strategy yields the same
  * long), and the kernel mirrors the HOF NULL algebra (NULL array /
  * NULL element / length mismatch → NULL).  Under ANSI mode −/·/+ raise
  * on long overflow where the kernel's wrapping loop would not, so the
  * match requires EvalMode.LEGACY on every operator and leaves ANSI
  * plans untouched (r6 ADVICE #1).  Matching is conservative:
  * exactly the (x−y)·(x−y) multiply of identical subtractions, zero
  * literal 0L, left-fold +, identity finish — anything else is left
  * untouched.
  */
object VecDist2Rewrite extends Rule[LogicalPlan] {

  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  private def sameVar(e: Expression, v: NamedExpression): Boolean = (e, v) match {
    case (a: NamedLambdaVariable, b: NamedLambdaVariable) => a.exprId == b.exprId
    case _ => false
  }

  private def isDiff(e: Expression, x: NamedExpression,
      y: NamedExpression): Boolean = e match {
    // LEGACY only: ANSI subtraction raises on long overflow where the
    // kernel's wrapping loop would not (r6 ADVICE #1) — under ANSI the
    // shape is left to the HOF evaluator, preserving error semantics.
    // (Checked via the evalMode ACCESSOR: the constructor slot holds a
    // NumericEvalContext wrapper in Spark 4.1, not the EvalMode itself.)
    case s: Subtract if s.evalMode == EvalMode.LEGACY =>
      sameVar(s.left, x) && sameVar(s.right, y)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b, LambdaFunction(mul: Multiply, Seq(x, y), _)),
            Literal(zero: Long, LongType),
            LambdaFunction(add: Add, Seq(acc, v), _),
            LambdaFunction(finishBody, Seq(finishArg), _))
          if zero == 0L && isLongArray(a) && isLongArray(b) &&
            mul.evalMode == EvalMode.LEGACY &&
            add.evalMode == EvalMode.LEGACY &&
            isDiff(mul.left, x, y) && isDiff(mul.right, x, y) &&
            sameVar(add.left, acc) && sameVar(add.right, v) &&
            sameVar(finishBody, finishArg) =>
        SquaredL2(a, b)
    }
}

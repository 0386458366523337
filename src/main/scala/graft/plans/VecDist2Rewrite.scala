package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate,
  Expression, LambdaFunction, Literal, Multiply, NamedExpression,
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
  * Safe unconditionally: the arithmetic is exact 64-bit integer, so there
  * is no summation-order contract to preserve (any strategy yields the
  * same long), and the kernel mirrors the HOF NULL algebra (NULL array /
  * NULL element / length mismatch → NULL).  Matching is conservative:
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
    case Subtract(l, r, _) => sameVar(l, x) && sameVar(r, y)
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
            isDiff(mul.left, x, y) && isDiff(mul.right, x, y) &&
            sameVar(add.left, acc) && sameVar(add.right, v) &&
            sameVar(finishBody, finishArg) =>
        SquaredL2(a, b)
    }
}

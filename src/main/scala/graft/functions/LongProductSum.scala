package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Add, And, AttributeReference, Cast, EvalMode, Expression, ExpressionInfo, GreaterThan, GreaterThanOrEqual, If, IsNull, LessThan, LessThanOrEqual, Literal, Multiply, Or}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types.{BooleanType, DataType, DecimalType, LongType}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.Decimal

/** `bigprodsum(bigint, bigint) -> DECIMAL(38,0)` — exact
  * Σ aᵢ·bᵢ whose hot path is one 64-bit multiply and one 64-bit add.
  *
  * The product companion of [[LongExactSum]] (`bigsum`), for the
  * rank/revenue moment aggregations (`q_an_gini`'s Σ rk·c, `q_an_hhi`'s
  * Σ c²) that previously multiplied per row in DECIMAL — a Java
  * BigDecimal allocate/multiply per group member inside the hash
  * aggregate.  Unlike the corr family (whose operands are input-bounded
  * so a plain long multiply provably cannot wrap), per-customer-month
  * cents have no a-priori bound, so the fast path is GUARDED: the long
  * multiply runs only when both |a| and |b| ≤ 1518500249 = ⌊√2^61⌋
  * (≈ $15.2M in cents — effectively every row), which bounds |a·b| ≤ 2^61
  * and hands the [[LongExactSum]] run-accumulator invariant its input
  * contract; larger operands take an exact DECIMAL(19,0)×DECIMAL(19,0)
  * bypass (38 digits hold any long×long product), so no input overflows,
  * silently or otherwise.
  *
  *   buffer  (acc DECIMAL(38,0), run BIGINT, empty BOOLEAN)
  *   update  both small:  run += a*b            (pure long math)
  *                        |run| > 2^61 -> acc += run; run = 0
  *           either big:  acc += dec(a) * dec(b)
  *   merge   acc += that.acc + that.run
  *   result  empty ? NULL : acc + run
  *
  * Semantics match `SUM(CAST(a AS DECIMAL(p,0)) * CAST(b AS
  * DECIMAL(p,0)))` exactly wherever that spelling itself does not
  * overflow (integer sums are associative; LongProductSumSpec pins
  * equality on randomized inputs, the guard boundary, NULLs, and the
  * empty group), so the gini/hhi oracles keep their DECIMAL-product
  * spelling.
  */
case class LongProductSum(left: Expression, right: Expression)
    extends DeclarativeAggregate with BinaryLike[Expression] {

  private def dec = DecimalType(38, 0)
  private def dec19 = DecimalType(19, 0)

  /** Per-operand fast-path ceiling ⌊√2^61⌋: both operands within it
    * bound the product by 2^61, the run accumulator's input contract. */
  private def S = 1518500249L

  /** Run-accumulator spill ceiling (2^61), as in [[LongExactSum]]. */
  private def T = 1L << 61

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bigprodsum needs two BIGINT inputs, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")

  override def dataType: DataType = dec
  override def nullable: Boolean = true
  override def prettyName: String = "bigprodsum"

  private lazy val acc = AttributeReference("acc", dec, nullable = false)()
  private lazy val run = AttributeReference("run", LongType, nullable = false)()
  private lazy val empty =
    AttributeReference("empty", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes
      : Seq[AttributeReference] = Seq(acc, run, empty)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(Decimal(0), dec), Literal(0L), Literal(true))

  /** LEGACY-mode arithmetic: the fast path is overflow-safe by the guard
    * invariant, so ANSI sessions must not pay a dead overflow branch. */
  private def rawAdd(l: Expression, r: Expression) = Add(l, r, EvalMode.LEGACY)
  private def decAdd(l: Expression, r: Expression) = Add(l, r, EvalMode.LEGACY)

  private def over(e: Expression) =
    Or(GreaterThan(e, Literal(T)), LessThan(e, Literal(-T)))
  private def small(e: Expression) =
    And(LessThanOrEqual(e, Literal(S)), GreaterThanOrEqual(e, Literal(-S)))

  override lazy val updateExpressions: Seq[Expression] = {
    val anyNull = Or(IsNull(left), IsNull(right))
    val fast = And(small(left), small(right))
    // |p| ≤ S² < 2^61 under `fast`; |run| ≤ 2^61 at entry, so the add is
    // bounded by 2^62 and cannot wrap.
    val p = Multiply(left, right, EvalMode.LEGACY)
    val newRun = rawAdd(run, p)
    // DECIMAL(19,0) holds any long; the ×-result type DECIMAL(38,0)
    // holds any long×long product — the bypass is exact for all inputs.
    val pDec = Cast(Multiply(Cast(left, dec19), Cast(right, dec19),
      EvalMode.LEGACY), dec)
    val accOut = If(anyNull, acc,
      If(fast,
        If(over(newRun), decAdd(acc, Cast(newRun, dec)), acc),
        decAdd(acc, pDec)))
    val runOut = If(anyNull, run,
      If(fast,
        If(over(newRun), Literal(0L), newRun),
        run))
    Seq(accOut, runOut, And(empty, anyNull))
  }

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    decAdd(decAdd(acc.left, acc.right), Cast(run.right, dec)),
    run.left,
    And(empty.left, empty.right))

  override lazy val evaluateExpression: Expression =
    If(empty, Literal(null, dec), decAdd(acc, Cast(run, dec)))

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): LongProductSum =
    copy(left = newLeft, right = newRight)
}

object LongProductSum {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("bigprodsum"),
      new ExpressionInfo(classOf[LongProductSum].getName, "bigprodsum"),
      (children: Seq[Expression]) =>
        LongProductSum(children(0), children(1)))
}

package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Add, And, AttributeReference, Cast, EvalMode, Expression, ExpressionInfo, GreaterThan, If, IsNull, LessThan, Literal, Or}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BooleanType, DataType, DecimalType, LongType}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.Decimal

/** `bigsum(bigint) -> DECIMAL(38,0)` — exact integer SUM whose hot path is
  * a plain 64-bit add.
  *
  * Why it exists: Spark stores a SUM-over-DECIMAL aggregation buffer in its
  * non-compact form whenever the result precision exceeds 18 digits (SUM
  * over DECIMAL(p,s) widens to p+10), so every fact-table row pays a Java
  * BigDecimal deserialize/add/serialize in the hash-aggregate buffer.  For
  * exact-moment queries that sum per-row INTEGER products (the Pearson
  * family's Σx·y / Σy², `q_an_corr`) that constant dominates the scan at
  * 100 TB row rates — the r12 verdict called for "per-partition BIGINT
  * partials with overflow-checked widening to DECIMAL at merge", which is
  * precisely this operator.
  *
  * Shape: a [[DeclarativeAggregate]] — all three phases are closed-form
  * Catalyst expressions, so the whole-stage codegen'd update path is a
  * long add plus two comparisons, no custom eval loop:
  *
  *   buffer  (acc DECIMAL(38,0), run BIGINT, empty BOOLEAN)
  *   update  run += v                      (the fast path, pure long math)
  *           |run| > 2^61  ->  acc += run; run = 0      (rare spill)
  *           |v|   > 2^61  ->  acc += v                 (giant-input bypass)
  *   merge   acc += that.acc + that.run    (one decimal add per partition)
  *   result  empty ? NULL : acc + run
  *
  * Overflow safety is an invariant, not a runtime check: |run| ≤ 2^61 at
  * the start of every update and the fast path only ever adds a value
  * with |v| ≤ 2^61, so `run + v` is bounded by 2^62 < Long.MaxValue — the
  * long add CANNOT wrap (the adds are constructed in LEGACY eval mode so
  * ANSI sessions don't pay a useless overflow branch).  Inputs past 2^61
  * take the decimal bypass.  The DECIMAL(38,0) accumulator is exact out to
  * 10^38: ~10^19 spills of magnitude ≤ 2^62 — unreachable from any corpus.
  *
  * Semantics match `SUM(CAST(v AS DECIMAL(38,0)))` exactly (integer sums
  * are associative; LongExactSumSpec pins equality on randomized inputs,
  * the spill boundary, NULLs, and the empty group), so oracles keep the
  * plain-SUM spelling — DuckDB's SUM(BIGINT) accumulates in HUGEINT, the
  * same exact integer.
  */
case class LongExactSum(child: Expression)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  private def dec = DecimalType(38, 0)

  /** Fast-path ceiling (2^61): see overflow-safety note in the scaladoc. */
  private def T = 1L << 61

  // AbstractDataType/ExpectsInputTypes are private[sql]; check directly
  // (the MinHashSignature pattern).
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bigsum needs a BIGINT input, got ${child.dataType.sql}")

  override def dataType: DataType = dec
  override def nullable: Boolean = true
  override def prettyName: String = "bigsum"

  private lazy val acc = AttributeReference("acc", dec, nullable = false)()
  private lazy val run = AttributeReference("run", LongType, nullable = false)()
  private lazy val empty =
    AttributeReference("empty", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes
      : Seq[AttributeReference] = Seq(acc, run, empty)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(Decimal(0), dec), Literal(0L), Literal(true))

  /** Long add that provably cannot wrap — LEGACY mode so ANSI sessions
    * don't emit a dead overflow check into the per-row codegen. */
  private def rawAdd(l: Expression, r: Expression) = Add(l, r, EvalMode.LEGACY)

  /** Decimal add on the (rare) spill/merge path; bounded by the 10^38
    * headroom argument, so eval mode is irrelevant — LEGACY keeps the
    * generated code branch-free. */
  private def decAdd(l: Expression, r: Expression) = Add(l, r, EvalMode.LEGACY)

  private def over(e: Expression) =
    Or(GreaterThan(e, Literal(T)), LessThan(e, Literal(-T)))

  override lazy val updateExpressions: Seq[Expression] = {
    val v = child
    val newRun = rawAdd(run, v)
    val accOut = If(IsNull(v), acc,
      If(over(v), decAdd(acc, Cast(v, dec)),
        If(over(newRun), decAdd(acc, Cast(newRun, dec)), acc)))
    val runOut = If(IsNull(v), run,
      If(over(v), run,
        If(over(newRun), Literal(0L), newRun)))
    Seq(accOut, runOut, And(empty, IsNull(v)))
  }

  /** Merges happen once per (partition × group), so the right side's run
    * is folded straight into the decimal accumulator — no fast-path
    * bookkeeping needed across partials. */
  override lazy val mergeExpressions: Seq[Expression] = Seq(
    decAdd(decAdd(acc.left, acc.right), Cast(run.right, dec)),
    run.left,
    And(empty.left, empty.right))

  override lazy val evaluateExpression: Expression =
    If(empty, Literal(null, dec), decAdd(acc, Cast(run, dec)))

  override protected def withNewChildInternal(newChild: Expression)
      : LongExactSum = copy(child = newChild)
}

object LongExactSum {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("bigsum"),
      new ExpressionInfo(classOf[LongExactSum].getName, "bigsum"),
      (children: Seq[Expression]) => LongExactSum(children.head))
}

package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Exact integer squared L2 distance over two BIGINT[] vectors — the
  * assignment kernel of [[graft.llm.Clustering]]'s k-means, which runs it
  * N × k times per Lloyd iteration.  The declarative spelling
  * (`aggregate(zip_with(a, b, (x, y) -> (x-y)*(x-y)), 0L, +)`) is two
  * lambda-interpreted walks per (vector, centroid) pair outside
  * whole-stage codegen — the same escalation as [[DotProduct]]; here it is
  * one primitive long loop.
  *
  * All arithmetic is exact 64-bit integer (the quantized embeddings keep
  * elements ≪ overflow), so unlike the float kernels there is no
  * summation-order contract to preserve — any evaluation strategy yields
  * the same integer, which is why the DuckDB oracle can keep its
  * `list_reduce` spelling untouched.  NULL algebra mirrors the HOF form:
  * NULL array → NULL; NULL element or length mismatch → NULL.
  */
case class SquaredL2(left: Expression, right: Expression)
    extends BinaryExpression {

  // Callers guarantee array<bigint> inputs (the [[HyperplaneBuckets]]
  // convention — ExpectsInputTypes is private[sql]).
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dist2"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SquaredL2.dist2(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |java.lang.Long ${ev.value}_boxed =
         |  graft.functions.SquaredL2.dist2($a, $b);
         |if (${ev.value}_boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_boxed.longValue();
         |}
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SquaredL2 =
    copy(left = newLeft, right = newRight)
}

object SquaredL2 {

  /** Shared kernel for interpreted eval and generated code. */
  def dist2(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getLong(i) - b.getLong(i)
      acc += d * d
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("vec_dist2"),
      new ExpressionInfo(classOf[SquaredL2].getName, "vec_dist2"),
      (children: Seq[Expression]) => SquaredL2(children.head, children(1)))

  /** Register `vec_dist2(array<bigint>, array<bigint>)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      description._1, description._2, description._3)
}

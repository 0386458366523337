package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product over two embedding arrays — the cosine kernel for
  * the whole similarity family ([[graft.llm.Similarity]] ANN queries,
  * [[graft.llm.Dedup.embeddingCosine]], [[graft.llm.Clustering]]'s
  * SemDeDup scorer).
  *
  * Same escalation rationale as [[HyperplaneBuckets]]: the built-in
  * formulation `aggregate(zip_with(a, b, (x, y) -> x*y), 0D, +)` evaluates
  * two lambda-interpreted walks per pair OUTSIDE whole-stage codegen, and
  * pair scoring is exactly the hot path of the bucket-bounded dedup
  * queries (candidate pairs × dims interpreted ops).  Here it is one
  * primitive fused-multiply loop inside codegen.
  *
  * Cross-engine contract: accumulates `acc + x_i·y_i` in element order —
  * the SAME left fold as the declarative spec and as the DuckDB oracles'
  * `list_reduce` spelling ([[graft.llm.Similarity.dotOracle]]), so the
  * doubles agree bit-for-bit (SimilaritySpec proves kernel ≡ spec on real
  * data).  NULL semantics mirror the HOF form: a NULL array → NULL; a
  * NULL element or length mismatch (zip_with pads with NULL) poisons the
  * sum → NULL.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // Callers guarantee array<float|double> inputs (ExpectsInputTypes is
  // private[sql] — the [[HyperplaneBuckets]] convention).
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  private lazy val leftDouble: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == DoubleType
  private lazy val rightDouble: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftDouble, rightDouble)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |java.lang.Double ${ev.value}_boxed =
         |  graft.functions.DotProduct.dot($a, $b, $leftDouble, $rightDouble);
         |if (${ev.value}_boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_boxed.doubleValue();
         |}
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {

  /** Shared kernel for interpreted eval and generated code.  Returns null
    * on length mismatch or any NULL element (the zip_with/aggregate NULL
    * algebra of the declarative spec). */
  def dot(a: ArrayData, b: ArrayData,
      aDouble: Boolean, bDouble: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aDouble) a.getDouble(i) else a.getFloat(i).toDouble
      val y = if (bDouble) b.getDouble(i) else b.getFloat(i).toDouble
      acc += x * y
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      (children: Seq[Expression]) => DotProduct(children.head, children(1)))

  /** Register `vec_dot(array<float|double>, array<float|double>)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      description._1, description._2, description._3)
}

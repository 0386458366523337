package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native random-hyperplane LSH buckets: given an embedding array, returns
  * `tables` bucket ids, one per LSH table; table `t`'s bucket sets bit `b`
  * when the embedding's projection onto deterministic hyperplane
  * `p = t·bits + b` is positive.
  *
  * Same escalation rationale as [[MinHashSignature]]/[[SimHashBands]]: the
  * built-in formulation ([[graft.llm.Similarity.bucketExpr]]) evaluates one
  * interpreted `aggregate(zip_with(...))` higher-order function per plane —
  * `tables × bits` lambda-interpreted walks over the vector per row, outside
  * whole-stage codegen, and dominated the embedding-dedup benchmark.  Here
  * every (plane, dim) weight is recomputed in one codegen'd primitive loop —
  * O(tables × bits × dims) fused multiply-adds, no allocation beyond the
  * output array.
  *
  * Cross-engine contract: identical math to the SQL/DuckDB formulations —
  * weight(k) = `((k · 2654435761) mod 1e9+7) / 500000003 − 1` for
  * `k = p·4099 + i + 1` (exact 64-bit integer mix, max ≈ 3.5e14, then one
  * exact int→double conversion and one double division), accumulated in
  * element order as `acc + x_i·w_i` — the same left fold as
  * `aggregate(..., 0D, (acc, v) -> acc + v)`, so the doubles and therefore
  * the sign tests agree bit-for-bit.  A NULL element poisons every plane
  * sum to NULL in SQL, whose `CASE sum > 0` then yields 0 for every bit —
  * mirrored here by returning all-zero buckets.
  */
case class HyperplaneBuckets(child: Expression, tables: Int, bits: Int)
    extends UnaryExpression {

  // Callers guarantee child: array<float|double> (AbstractDataType /
  // ExpectsInputTypes are private[sql], so no declarative check from here).
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "hyperplane_buckets"

  private lazy val isDouble: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(HyperplaneBuckets.buckets(
      input.asInstanceOf[ArrayData], tables, bits, isDouble))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.HyperplaneBuckets.buckets($c, $tables, $bits, $isDouble));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
}

object HyperplaneBuckets {
  val MixMultiplier = 2654435761L
  val MixPrime = 1000000007L
  val MixHalf = 500000003.0

  /** Shared kernel for interpreted eval and generated code. */
  def buckets(emb: ArrayData, tables: Int, bits: Int,
      isDouble: Boolean): Array[Int] = {
    val n = emb.numElements()
    val out = new Array[Int](tables)
    var i = 0
    while (i < n) { // NULL element => every SQL plane sum NULL => all bits 0
      if (emb.isNullAt(i)) return out
      i += 1
    }
    var t = 0
    while (t < tables) {
      var bkt = 0
      var b = 0
      while (b < bits) {
        val p = t * bits + b
        var acc = 0.0
        var j = 0
        while (j < n) {
          val k = (p * 4099 + j + 1).toLong
          val w = ((k * MixMultiplier) % MixPrime).toDouble / MixHalf - 1.0
          val x = if (isDouble) emb.getDouble(j) else emb.getFloat(j).toDouble
          acc += x * w
          j += 1
        }
        if (acc > 0) bkt += 1 << b
        b += 1
      }
      out(t) = bkt
      t += 1
    }
    out
  }

  /** Function description shared by per-session registration and the
    * [[graft.GraftExtensions]] injection path.  `tables` and `bits` must be
    * integer literals (they shape the output, like a codegen template). */
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("hyperplane_buckets"),
      new ExpressionInfo(classOf[HyperplaneBuckets].getName, "hyperplane_buckets"),
      (children: Seq[Expression]) => HyperplaneBuckets(children.head,
        children(1).eval().asInstanceOf[Int], children(2).eval().asInstanceOf[Int]))

  /** Register `hyperplane_buckets(array<float|double>, tables, bits)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      description._1, description._2, description._3)
}

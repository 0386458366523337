package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native SimHash band keys: given `array<string>` tokens, returns the 4
  * 16-bit band values of the 64-bit SimHash (band 0 = bits 63..48 … band 3
  * = bits 15..0).
  *
  * Same escalation rationale as [[MinHashSignature]]: the built-in
  * formulation needs 64 interpreted `aggregate` higher-order functions per
  * row (one per bit), re-walking the token-hash array 64 times outside
  * whole-stage codegen.  Here each token is hashed once and its 64 bit
  * votes accumulate in one codegen'd loop — O(tokens × 64) primitive long
  * ops.
  *
  * Cross-engine contract: identical math to `Dedup.simhashOracle` — token
  * hash = character polynomial `(acc*131 + char) mod 1e9+7`, bit b's vote =
  * sign of `((h+1)·(2b+3)) mod 1e9+7` against the majority threshold — all
  * exact modular arithmetic (max intermediate ≈ 1.3e11), so DuckDB
  * reproduces the bands bit-for-bit.  Characters are UTF-16 units, equal to
  * code points on the BMP (the corpus is ASCII).
  */
case class SimHashBands(child: Expression) extends UnaryExpression {

  import SimHashBands._

  // Callers guarantee child: array<string> (AbstractDataType/ExpectsInputTypes
  // are private[sql], so no declarative input-type check from here).
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "simhash_bands"

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(bands(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.SimHashBands.bands($c));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): SimHashBands =
    copy(child = newChild)
}

object SimHashBands {
  val Prime = 1000000007L
  val Half: Long = Prime / 2
  val NumBits = 64
  val BandBits = 16
  val NumBands: Int = NumBits / BandBits

  /** Shared kernel for interpreted eval and generated code. */
  def bands(tokens: ArrayData): Array[Long] = {
    val votes = new Array[Long](NumBits)
    val n = tokens.numElements()
    var j = 0
    while (j < n) {
      val s = tokens.getUTF8String(j).toString
      var h = 0L
      var k = 0
      while (k < s.length) {
        h = (h * 131 + s.charAt(k)) % Prime
        k += 1
      }
      var b = 0
      while (b < NumBits) {
        votes(b) += (if (((h + 1) * (2L * b + 3)) % Prime > Half) 1 else -1)
        b += 1
      }
      j += 1
    }
    val out = new Array[Long](NumBands)
    var band = 0
    while (band < NumBands) {
      var v = 0L
      var j2 = 0
      while (j2 < BandBits) {
        // Bit 63-(band*16+j2) of the 64-bit word, weighted 2^(15-j2) within
        // the band — the exact layout Dedup.simhashOracle mirrors.
        if (votes(63 - (band * BandBits + j2)) > 0) v += 1L << (BandBits - 1 - j2)
        j2 += 1
      }
      out(band) = v
      band += 1
    }
    out
  }

  /** Function description shared by per-session registration and the
    * [[graft.GraftExtensions]] injection path. */
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("simhash_bands"),
      new ExpressionInfo(classOf[SimHashBands].getName, "simhash_bands"),
      (children: Seq[Expression]) => SimHashBands(children.head))

  /** Register `simhash_bands(array<string>)` on the session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      description._1, description._2, description._3)
}

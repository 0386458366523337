package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash signature over word tokens: given `array<string>` tokens,
  * forms 3-shingles, hashes each, and returns the
  * [[MinHashSignature.NumHashes]] affine-permutation minima
  * `min_shingle ((a_i * h + b_i) mod p)` with `a_i = 2i+1`, `b_i = 7i+3`,
  * `p = 2^31 - 1`.
  *
  * Why a custom Catalyst expression instead of built-ins: the
  * `transform(sequence(...), i -> ... slice(split(text), i, 3) ...)`
  * formulation re-evaluates `split` and builds a shingle STRING inside an
  * interpreted lambda for every shingle index — O(tokens²) string work per
  * document, which dominated the dedup benchmark.  Here each token is
  * hashed once and each shingle hash is a 3-way mix of token hashes —
  * O(tokens + shingles × NumHashes) primitive long ops in one codegen'd
  * loop ([[doGenCode]]).  This is the escalation path the engine prefers
  * when built-ins can't express a kernel efficiently: native Expression
  * with codegen > Scala UDF.
  *
  * Duplicate shingles need no dedup — duplicates cannot change a minimum.
  * Documents with fewer than 3 tokens contribute a single shingle mixing
  * whatever tokens exist.
  */
case class MinHashSignature(child: Expression)
    extends UnaryExpression {

  import MinHashSignature._

  // Callers guarantee child: array<string> (AbstractDataType/ExpectsInputTypes
  // are private[sql], so no declarative input-type check from here).
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val tokHashes = new Array[Long](n)
    var j = 0
    while (j < n) {
      tokHashes(j) = arr.getUTF8String(j).hashCode().toLong
      j += 1
    }
    new GenericArrayData(signature(tokHashes))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tok = ctx.freshName("tokHashes")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      s"""
         |final int $n = $c.numElements();
         |final long[] $tok = new long[$n];
         |for (int $j = 0; $j < $n; $j++) {
         |  $tok[$j] = (long) $c.getUTF8String($j).hashCode();
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.MinHashSignature.signature($tok));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  val NumHashes = 64
  val Prime = 2147483647L // 2^31 - 1
  val ShingleWidth = 3

  /** Shared kernel for interpreted eval and generated code. */
  def signature(tokHashes: Array[Long]): Array[Long] = {
    val mins = Array.fill(NumHashes)(Long.MaxValue)
    val n = tokHashes.length
    val nShingles = math.max(n - ShingleWidth + 1, 1)
    var j = 0
    while (j < nShingles) {
      // Mix the shingle's token hashes (fewer than ShingleWidth near the
      // end only when the document itself is shorter than one shingle).
      var h = 1125899906842597L
      var k = j
      val end = math.min(j + ShingleWidth, n)
      while (k < end) {
        h = h * 31 + tokHashes(k)
        k += 1
      }
      val sh = java.lang.Math.floorMod(h, Prime)
      var i = 0
      while (i < NumHashes) {
        val v = ((2L * i + 1) * sh + 7L * i + 3) % Prime
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    mins
  }

  /** Function description shared by per-session registration and the
    * [[graft.GraftExtensions]] injection path. */
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (children: Seq[Expression]) => MinHashSignature(children.head))

  /** Register `minhash_signature(array<string>)` on the session so plans can
    * reference it via `expr(...)` / SQL. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      description._1, description._2, description._3)
}

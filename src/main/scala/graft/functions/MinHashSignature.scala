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
  * Cross-engine contract (round-3): every step is exact modular integer
  * arithmetic — token hash = character polynomial `(acc*131 + char) mod p`,
  * shingle mix = `(acc*31 + tokHash) mod p` seeded at 17 — with NO 64-bit
  * wraparound anywhere (round 2 used `UTF8String.hashCode` + Java long
  * overflow, which no other engine reproduces).  An independent engine with
  * the same fold (`Dedup.minhashOracle`) now produces bit-identical
  * signatures.  Characters are UTF-16 units, equal to code points on the
  * BMP (the corpus is ASCII).
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
      tokHashes(j) = tokenHash(arr.getUTF8String(j).toString)
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
         |  $tok[$j] = graft.functions.MinHashSignature.tokenHash(
         |    $c.getUTF8String($j).toString());
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

  /** Character polynomial mod [[Prime]] — exact in any engine (max
    * intermediate ≈ 2.8e11, no wraparound). */
  def tokenHash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      h = (h * 131 + s.charAt(i)) % Prime
      i += 1
    }
    h
  }

  /** Shared kernel for interpreted eval and generated code. */
  def signature(tokHashes: Array[Long]): Array[Long] = {
    val mins = Array.fill(NumHashes)(Long.MaxValue)
    val n = tokHashes.length
    val nShingles = math.max(n - ShingleWidth + 1, 1)
    var j = 0
    while (j < nShingles) {
      // Mix the shingle's token hashes (fewer than ShingleWidth near the
      // end only when the document itself is shorter than one shingle).
      // Modular at every step: token hashes are < Prime so the largest
      // intermediate is 31 * Prime + Prime ≈ 6.9e10 — exact everywhere.
      var h = 17L
      var k = j
      val end = math.min(j + ShingleWidth, n)
      while (k < end) {
        h = (h * 31 + tokHashes(k)) % Prime
        k += 1
      }
      val sh = h
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

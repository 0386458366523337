package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-n-gram shingle set of a text column —
  * `ngram_shingles(text, n)` ≡ the declarative
  * [[graft.llm.Dedup.ngramSetExpr]] formulation
  *
  * {{{ array_distinct(transform(sequence(1, greatest(size - n + 1, 1)),
  *       i -> concat_ws(' ', slice(split(text, ' '), i, n)))) }}}
  *
  * including first-occurrence order, the `split(_, ' ')` empty-token
  * convention on repeated spaces, and the whole-list shingle for documents
  * shorter than one n-gram (WordNgramShinglesSpec asserts the equivalence
  * element-for-element).
  *
  * Why a custom Catalyst expression: in the declarative form the lambda
  * body's `split(text, ' ')` re-tokenizes the document for EVERY shingle
  * index — O(tokens²) string work per document, interpreted (lambda
  * functions don't participate in whole-stage codegen) — and it dominated
  * `q_dedup_ngram_jaccard`.  Here the document is tokenized once and each
  * shingle is one StringBuilder append pass — O(chars + shingles·n) in one
  * codegen'd call ([[doGenCode]]).  Same escalation path as
  * [[MinHashSignature]], which replaced the identical pattern in the
  * MinHash pipeline (reference analogue: the near-dup shingling of
  * `dedup/minhash.rs`, re-expressed Spark-first).
  */
case class WordNgramShingles(child: Expression, n: Int,
    distinct: Boolean = true) extends UnaryExpression {

  // Callers guarantee child: string (AbstractDataType/ExpectsInputTypes are
  // private[sql] in Spark 4 — no declarative input-type check).
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ngram_shingles"

  override protected def nullSafeEval(input: Any): Any =
    WordNgramShingles.shingles(input.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordNgramShingles.shingles($c, $n, $distinct);")

  override protected def withNewChildInternal(newChild: Expression): WordNgramShingles =
    copy(child = newChild)
}

object WordNgramShingles {

  /** Shared kernel for interpreted eval and generated code.  With
    * `distinct = false` it keeps every occurrence in order — the
    * multiplicity form repetition metrics need
    * ([[graft.llm.TextAnalysis.repetition]]), ≡ the same declarative
    * transform WITHOUT the array_distinct wrapper. */
  def shingles(text: UTF8String, n: Int,
      distinct: Boolean = true): GenericArrayData = {
    // Spark's split(text, ' ') is String.split(regex, -1): single-space
    // separators, empty tokens preserved (incl. trailing).
    val toks = text.toString.split(" ", -1)
    val len = toks.length
    val nShingles = math.max(len - n + 1, 1)
    val seen: mutable.Growable[String] with Iterable[String] =
      if (distinct) new mutable.LinkedHashSet[String]
      else new mutable.ArrayBuffer[String](nShingles)
    var i = 0
    while (i < nShingles) {
      // slice(arr, i+1, n) caps at the array end.
      val end = math.min(i + n, len)
      val sb = new java.lang.StringBuilder
      var k = i
      while (k < end) {
        if (k > i) sb.append(' ')
        sb.append(toks(k))
        k += 1
      }
      seen += sb.toString
      i += 1
    }
    val out = new Array[AnyRef](seen.size)
    var j = 0
    seen.foreach { s => out(j) = UTF8String.fromString(s); j += 1 }
    new GenericArrayData(out)
  }

  /** Function description shared by per-session registration and the
    * [[graft.GraftExtensions]] injection path; `n` must be an integer
    * literal (it is baked into the generated code). */
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("ngram_shingles"),
      new ExpressionInfo(classOf[WordNgramShingles].getName, "ngram_shingles"),
      (children: Seq[Expression]) => children(1) match {
        case Literal(v: Int, _) =>
          val distinct = children.lift(2) match {
            case None                      => true
            case Some(Literal(b: Boolean, _)) => b
            case Some(other) => throw new IllegalArgumentException(
              s"ngram_shingles: distinct must be a boolean literal, got $other")
          }
          WordNgramShingles(children.head, v, distinct)
        case other => throw new IllegalArgumentException(
          s"ngram_shingles: n must be an integer literal, got $other")
      })

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      description._1, description._2, description._3)
}

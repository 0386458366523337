package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** `char_poly_hash(string)` — the engine's cross-engine string hash as a
  * scalar: the [[MinHashSignature.tokenHash]] character polynomial
  * `(acc·131 + char) mod (2^31 − 1)`, exact in any engine (no 64-bit
  * wraparound; characters are UTF-16 units = code points on the BMP, and
  * the corpus is ASCII).  Turns any string column into a [[Mix31]]-ready
  * BIGINT key — [[graft.llm.Profiler]] feeds it to [[HllSketch]] for
  * distinct estimates over string columns; an independent engine replays
  * it as a `list_reduce` fold over `ascii(substr(...))`
  * (`Dedup.minhashOracle` spelling).
  */
case class CharPolyHash(child: Expression) extends UnaryExpression {

  // Callers guarantee child: string (AbstractDataType/ExpectsInputTypes are
  // private[sql] in Spark 4 — no declarative input-type check).
  override def dataType: DataType = LongType
  override def prettyName: String = "char_poly_hash"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSignature.tokenHash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSignature.tokenHash($c.toString());")

  override protected def withNewChildInternal(newChild: Expression): CharPolyHash =
    copy(child = newChild)
}

object CharPolyHash {
  /** The identical fold as DuckDB SQL over a VARCHAR expression. */
  def duckSql(col: String): String =
    s"""list_reduce(
       |  list_prepend(CAST(0 AS BIGINT),
       |    list_transform(generate_series(1, length($col)),
       |      i -> CAST(ascii(substr($col, i, 1)) AS BIGINT))),
       |  (acc, c) -> (acc * 131 + c) % ${MinHashSignature.Prime})""".stripMargin

  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("char_poly_hash"),
      new ExpressionInfo(classOf[CharPolyHash].getName, "char_poly_hash"),
      (children: Seq[Expression]) => CharPolyHash(children.head))

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      description._1, description._2, description._3)
}

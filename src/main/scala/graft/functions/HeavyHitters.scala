package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo,
  Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch: `mg_topk(token, k)` returns the ≤ k
  * surviving (token, est) pairs, sorted by (est DESC, token ASC).
  *
  * The one-pass, fixed-memory answer to "what are the frequent items" when
  * an exact groupBy would shuffle every distinct key: the state is at most
  * k counters, [[merge]] is counter addition followed by the (k+1)-th
  * largest-count subtraction (Agarwal et al., "Mergeable Summaries", PODS
  * 2012), so Spark runs it map-side and the exchange carries ≤ k pairs per
  * (partition, group) — the 100 TB story, same shape as [[HllSketch]].
  *
  * Guarantees (HeavyHittersSpec property-tests both, including under
  * merge): every item with true frequency > n/(k+1) survives, and each
  * estimate is in [true − n/(k+1), true].  When the group's distinct-item
  * count never exceeds k the decrement path never fires and every count is
  * EXACT — the registered query ([[graft.llm.Vocab.heavyHitters]]) sizes k
  * above the synthetic vocabulary, so the driver gate hash-checks the
  * sketch's own output against DuckDB's exact counts, the
  * [[HllSketch]]/`q_an_hll_sketch` precedent.
  *
  * Determinism: counters are exact integers; [[eval]] imposes a total
  * (est DESC, token ASC) order; in the exact regime the state is
  * partition-order independent, and in the approximate regime the
  * guarantee band (not a fixed state) is the contract.
  */
case class HeavyHitters(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k >= 1, "mg_topk capacity must be >= 1")

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("token", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = child :: Nil
  override def prettyName: String = "mg_topk"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) HeavyHitters.add(buf, v.toString, 1L, k)
    buf
  }

  override def merge(a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (item, c) => a.updateWith(item) {
      case Some(x) => Some(x + c)
      case None    => Some(c)
    } }
    HeavyHitters.shrink(a, k)
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      buf.toSeq.sortBy { case (item, c) => (-c, item) }
        .map { case (item, c) =>
          InternalRow(UTF8String.fromString(item), c)
        }.toArray[Any])

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (item, c) =>
      val bytes = item.getBytes("UTF-8")
      out.writeInt(bytes.length); out.write(bytes); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      m.put(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHitters =
    copy(child = newChildren.head)
}

object HeavyHitters {

  /** One observation with weight w — the Misra-Gries step: bump if
    * tracked, insert if a counter is free, else decrement everyone (the
    * "cancel k+1 distinct occurrences" move that yields the n/(k+1)
    * error bound). */
  def add(m: mutable.HashMap[String, Long], item: String, w: Long,
      k: Int): Unit =
    m.get(item) match {
      case Some(c) => m.put(item, c + w)
      case None if m.size < k => m.put(item, w)
      case None =>
        // Decrement all by min(w, current minimum) repeatedly is the
        // weighted generalization; for w = 1 (the update path) this is
        // one classic decrement sweep.
        var rem = w
        while (rem > 0 && m.get(item).isEmpty) {
          if (m.size < k) { m.put(item, rem); rem = 0 }
          else {
            val d = math.min(rem, m.values.min)
            val dead = mutable.ArrayBuffer.empty[String]
            m.mapValuesInPlace((_, c) => c - d)
            m.foreach { case (i, c) => if (c <= 0) dead += i }
            dead.foreach(m.remove)
            rem -= d
          }
        }
    }

  /** Post-merge shrink: subtract the (k+1)-th largest count from every
    * counter and drop the non-positive — restores size ≤ k while keeping
    * the mergeable-summaries error bound additive. */
  def shrink(m: mutable.HashMap[String, Long], k: Int): Unit =
    if (m.size > k) {
      val d = m.values.toArray.sortBy(-_).apply(k)
      val dead = mutable.ArrayBuffer.empty[String]
      m.mapValuesInPlace((_, c) => c - d)
      m.foreach { case (i, c) => if (c <= 0) dead += i }
      dead.foreach(m.remove)
    }

  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("mg_topk"),
      new ExpressionInfo(classOf[HeavyHitters].getName, "mg_topk"),
      (children: Seq[Expression]) => {
        val k = children(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"mg_topk capacity must be an INT literal, got $other")
        }
        HeavyHitters(children.head, k)
      })

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      description._1, description._2, description._3)
}

package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** K-minimum-values distinct sketch: `kmv_sketch(key, k)` returns the k
  * smallest DISTINCT [[Mix31]] hashes of the group's keys as an ascending
  * BIGINT array — the sketch family member that supports set
  * INTERSECTION, which [[HllSketch]] cannot (HLL registers union
  * losslessly but carry no per-element identity to intersect on).
  *
  * The KMV estimator (Bar-Yossef et al. 2002; Beyer et al. 2007 for the
  * multi-set operations): the k-th smallest of n uniform hashes on
  * [0, 2^31) sits near k/n of the range, so
  *
  *   distinct_est = (k − 1) · 2^31 / h_(k)        (integer division)
  *
  * and because the sketch keeps the hash VALUES, two groups' sketches
  * combine into exact set algebra on a uniform sample: the k smallest of
  * A ∪ B's hash union form the union sketch, and the fraction of them
  * present in BOTH input sketches estimates the Jaccard similarity
  * (see [[graft.ops.AnalyticsQueries.kmvSetOps]] for the full chain).
  * Everything — hash, k-smallest selection, threshold, the estimate's
  * multiply-divide — is exact 64-bit integer arithmetic ((k−1)·2^31 ≤
  * 2^39; no wraparound in any engine), so an independent engine
  * reproduces the sketch AND the estimates bit-for-bit: the DuckDB
  * oracle mirrors the selection with a rank window and the estimate in
  * integer SQL.  Below k distinct hashes the sketch IS the distinct hash
  * set and the estimator is defined to return its size — the exact
  * regime, the same dual-regime contract as [[QuantileSketch]].
  *
  * Scale: the buffer is ≤ k longs per group regardless of group size,
  * update is an O(log k) ordered-set insert that rejects any hash above
  * the current k-th smallest, and [[merge]] replays one sketch into the
  * other — associative and commutative, so Spark runs it map-side and
  * the shuffle carries one ≤ 8k-byte sketch per (partition, group)
  * instead of raw keys.  Downstream set operations touch only k-sized
  * arrays — metadata, never data.  That is the 100 TB story: per-segment
  * audience sketches persist and any later overlap/union question is
  * array math, no raw re-scan.
  *
  * Reference analogue: none (the reference has no sketches); part of the
  * beyond-reference analytics surface next to [[HllSketch]] /
  * [[HeavyHitters]] / [[QuantileSketch]].
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]] {

  require(k >= 2, "kmv_sketch k must be >= 2")

  // Callers guarantee child: bigint (AbstractDataType/ExpectsInputTypes are
  // private[sql] in Spark 4 — the MinHashSignature convention).
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = child :: Nil
  override def prettyName: String = "kmv_sketch"

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long]

  override def update(
      buf: mutable.TreeSet[Long], input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) KmvSketch.addHash(buf, Mix31.mix(v.asInstanceOf[Long]), k)
    buf
  }

  override def merge(
      a: mutable.TreeSet[Long], b: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    b.foreach(h => KmvSketch.addHash(a, h, k))
    a
  }

  override def eval(buf: mutable.TreeSet[Long]): Any =
    new GenericArrayData(buf.toArray)

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val set = mutable.TreeSet.empty[Long]
    var i = 0
    while (i < n) { set += in.readLong(); i += 1 }
    set
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketch =
    copy(child = newChildren.head)
}

object KmvSketch {

  /** Insert an already-mixed hash, holding the set to the k smallest
    * distinct values — shared by [[KmvSketch.update]] (post-[[Mix31]]),
    * [[KmvSketch.merge]] (sketch elements are already hashes) and specs. */
  def addHash(set: mutable.TreeSet[Long], h: Long, k: Int): Unit = {
    if (set.size < k) set += h
    else if (h < set.last) {
      set += h
      if (set.size > k) set -= set.last
    }
  }

  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("kmv_sketch"),
      new ExpressionInfo(classOf[KmvSketch].getName, "kmv_sketch"),
      (children: Seq[Expression]) =>
        KmvSketch(children.head,
          QuantileSketch.capLiteral(children(1), "kmv_sketch")))

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      description._1, description._2, description._3)
}

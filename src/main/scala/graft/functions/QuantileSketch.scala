package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo,
  Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Mergeable quantile sketch over BIGINT values: `q_sketch(v, p, cap)`
  * returns the discrete p-quantile (smallest value whose cumulative weight
  * reaches ⌈p·n⌉).
  *
  * KLL-shaped level structure with DETERMINISTIC compaction: level i holds
  * items that each stand for 2^i originals; when a level's buffer exceeds
  * `cap` it is sorted and every second item (starting at offset i mod 2,
  * so the keep-low/keep-high bias alternates by level) is promoted to
  * level i+1.  Memory is O(cap · log(n/cap)) per group regardless of n,
  * and [[merge]] is per-level concatenation + the same compaction — so
  * Spark runs the sketch map-side and the shuffle carries one bounded
  * sketch per (partition, group) where exact percentiles
  * ([[graft.ops.AnalyticsQueries.percentiles]]) must move every row into
  * a full distributed sort.  That bounded-merge path is the 100 TB story;
  * the trade is the error band below.
  *
  * Exactness contract: until the first compaction (group size ≤ cap) the
  * sketch IS the sorted data and the answer is the exact discrete
  * quantile — deterministic regardless of partitioning, because levels
  * only concatenate and [[eval]] sorts.  The registered query
  * ([[graft.ops.AnalyticsQueries.quantileSketch]]) sizes cap above the
  * sf0.01 group sizes, so the driver gate hash-checks the sketch output
  * against an explicit rank-walk oracle (the [[HllSketch]] precedent:
  * prove the sketch machinery exact where exactness is defined, document
  * the band beyond).  Past cap, each compaction at level i displaces a
  * value's rank by at most 2^i, giving the usual deterministic-KLL
  * ε ≈ log²(n/cap)/cap rank error; QuantileSketchSpec measures ≤ 2% rank
  * error at n = 64·cap and proves the guarantee survives merge order.
  */
case class QuantileSketch(
    child: Expression,
    p: Double,
    cap: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSketch.State] {

  require(p > 0.0 && p <= 1.0, "q_sketch p must be in (0, 1]")
  require(cap >= 8, "q_sketch capacity must be >= 8")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def children: Seq[Expression] = child :: Nil
  override def prettyName: String = "q_sketch"

  override def createAggregationBuffer(): QuantileSketch.State =
    QuantileSketch.emptyState()

  override def update(buf: QuantileSketch.State,
      input: InternalRow): QuantileSketch.State = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long], cap)
    buf
  }

  override def merge(a: QuantileSketch.State,
      b: QuantileSketch.State): QuantileSketch.State = {
    a.mergeIn(b, cap); a
  }

  override def eval(buf: QuantileSketch.State): Any = buf.quantile(p)

  override def serialize(buf: QuantileSketch.State): Array[Byte] =
    QuantileSketch.serializeState(buf)

  override def deserialize(bytes: Array[Byte]): QuantileSketch.State =
    QuantileSketch.deserializeState(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileSketch =
    copy(child = newChildren.head)
}

object QuantileSketch {

  /** One level's growable PRIMITIVE buffer.  The r12 State kept
    * `ArrayBuffer[Long]` per level, which boxes every value on the add
    * path — at fact-table row rates (60M adds at sf10) the allocation
    * churn dominated the aggregate.  Same algorithm, unboxed storage;
    * results are bit-identical (the compaction is the same sort over the
    * same multiset). */
  final class Level(initialCapacity: Int) {
    var arr: Array[Long] = new Array[Long](initialCapacity)
    var len: Int = 0
    def length: Int = len
    def nonEmpty: Boolean = len > 0
    def add(v: Long): Unit = {
      if (len == arr.length)
        arr = java.util.Arrays.copyOf(arr, math.max(8, arr.length * 2))
      arr(len) = v
      len += 1
    }
    def addAll(o: Level): Unit = {
      if (len + o.len > arr.length)
        arr = java.util.Arrays.copyOf(arr,
          math.max(len + o.len, arr.length * 2))
      System.arraycopy(o.arr, 0, arr, len, o.len)
      len += o.len
    }
    def clear(): Unit = len = 0
  }

  /** A fresh one-level State — the aggregation-buffer seed. */
  def emptyState(): State = new State(ArrayBuffer(new Level(8)))

  /** Level i's items each stand for 2^i original values.
    *
    * Weight contract: [[totalWeight]] equals the true count n exactly in
    * the exact regime (no compaction); past cap it drifts by ±2^i per
    * odd-length compaction at level i — bounded by ~2n·levels/cap
    * (QuantileSketchProps) — and [[quantile]] ranks against the
    * sketch's OWN weight, so the drift is just another component of the
    * deterministic-KLL rank-error band the spec measures. */
  final class State(val levels: ArrayBuffer[Level]) {

    def add(v: Long, cap: Int): Unit = {
      levels(0).add(v)
      if (levels(0).len > cap) cascade(cap)
    }

    def mergeIn(other: State, cap: Int): Unit = {
      var i = 0
      while (i < other.levels.length) {
        if (i >= levels.length) levels += new Level(8)
        levels(i).addAll(other.levels(i))
        i += 1
      }
      cascade(cap)
    }

    /** Compact every overfull level upward.  Deterministic: sort, keep
      * every second item starting at offset (level mod 2) — the kept
      * half's weight doubles at level+1. */
    private def cascade(cap: Int): Unit = {
      var i = 0
      while (i < levels.length) {
        val lvl = levels(i)
        if (lvl.len > cap) {
          java.util.Arrays.sort(lvl.arr, 0, lvl.len)
          if (i + 1 >= levels.length) levels += new Level(8)
          val next = levels(i + 1)
          var j = i % 2
          while (j < lvl.len) { next.add(lvl.arr(j)); j += 2 }
          lvl.clear()
        }
        i += 1
      }
    }

    def totalWeight: Long = {
      var s = 0L
      var i = 0
      while (i < levels.length) { s += levels(i).len.toLong << i; i += 1 }
      s
    }

    /** Discrete quantile: smallest value whose cumulative weight reaches
      * ⌈p·n⌉ in the weighted sorted multiset. */
    def quantile(p: Double): Any = {
      val n = totalWeight
      if (n == 0L) return null
      val rank = math.max(1L, math.ceil(p * n).toLong)
      if (levels.length == 1) {
        // Exact regime (never compacted): all weights are 1, so the
        // answer is a primitive in-place sort + direct index — the
        // common gate-scale path, no tuple boxing.  Idempotent: eval
        // for several probes re-sorts an already-sorted buffer.
        val lvl = levels(0)
        java.util.Arrays.sort(lvl.arr, 0, lvl.len)
        return lvl.arr(math.min(rank, lvl.len.toLong).toInt - 1)
      }
      val items = levels.iterator.zipWithIndex
        .flatMap { case (lvl, i) =>
          (0 until lvl.len).iterator.map(j => (lvl.arr(j), 1L << i)) }
        .toArray.sortBy(_._1)
      var cum = 0L
      var idx = 0
      while (idx < items.length) {
        cum += items(idx)._2
        if (cum >= rank) return items(idx)._1
        idx += 1
      }
      items.last._1
    }
  }

  /** Wire format shared by both aggregate classes (unchanged from r12:
    * int nLevels, then per level int len + len longs). */
  private[functions] def serializeState(buf: State): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.levels.length)
    buf.levels.foreach { lvl =>
      out.writeInt(lvl.len)
      var i = 0
      while (i < lvl.len) { out.writeLong(lvl.arr(i)); i += 1 }
    }
    out.flush(); bos.toByteArray
  }

  private[functions] def deserializeState(bytes: Array[Byte]): State = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val nLevels = in.readInt()
    val levels = ArrayBuffer.tabulate(nLevels) { _ =>
      val n = in.readInt()
      val lvl = new Level(math.max(8, n))
      var i = 0
      while (i < n) { lvl.add(in.readLong()); i += 1 }
      lvl
    }
    new State(levels)
  }

  private[functions] def pLiteral(e: Expression, fn: String): Double = e match {
    case Literal(v: Double, DoubleType) => v
    case Literal(v: Decimal, _) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"$fn p must be a DOUBLE literal, got $other")
  }

  private[functions] def capLiteral(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn capacity must be an INT literal, got $other")
  }

  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("q_sketch"),
      new ExpressionInfo(classOf[QuantileSketch].getName, "q_sketch"),
      (children: Seq[Expression]) =>
        QuantileSketch(children.head,
          pLiteral(children(1), "q_sketch"),
          capLiteral(children(2), "q_sketch")))

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      description._1, description._2, description._3)
    spark.sessionState.functionRegistry.registerFunction(
      QuantileSketchMulti.description._1, QuantileSketchMulti.description._2,
      QuantileSketchMulti.description._3)
  }
}

/** Multi-quantile form of [[QuantileSketch]]:
  * `q_sketch_multi(v, array(p1, ..., pk), cap)` returns all k discrete
  * quantiles from ONE sketch buffer — the single-pass answer to a query
  * that needs several boundaries of the same column (equi-depth histogram
  * boundaries, IQR fence pairs).  k independent `q_sketch` aggregates each
  * buffer the input once (k× memory and k× merge traffic for identical
  * state); this shares one [[QuantileSketch.State]] and one sorted
  * weighted walk at eval, so the 100 TB shuffle carries one bounded sketch
  * per (partition, group) regardless of how many probe points ride on it.
  * Identical level structure and quantile definition — in the exact regime
  * (cap ≥ n) each element is bit-equal to the corresponding `q_sketch`
  * call, a contract QuantileSketchSpec asserts. */
case class QuantileSketchMulti(
    child: Expression,
    ps: Seq[Double],
    cap: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSketch.State] {

  require(ps.nonEmpty && ps.forall(p => p > 0.0 && p <= 1.0),
    "q_sketch_multi probabilities must be in (0, 1]")
  require(cap >= 8, "q_sketch_multi capacity must be >= 8")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = true
  override def children: Seq[Expression] = child :: Nil
  override def prettyName: String = "q_sketch_multi"

  override def createAggregationBuffer(): QuantileSketch.State =
    QuantileSketch.emptyState()

  override def update(buf: QuantileSketch.State,
      input: InternalRow): QuantileSketch.State = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long], cap)
    buf
  }

  override def merge(a: QuantileSketch.State,
      b: QuantileSketch.State): QuantileSketch.State = {
    a.mergeIn(b, cap); a
  }

  override def eval(buf: QuantileSketch.State): Any =
    if (buf.totalWeight == 0L) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(
      ps.map(buf.quantile).toArray)

  override def serialize(buf: QuantileSketch.State): Array[Byte] =
    QuantileSketch.serializeState(buf)

  override def deserialize(bytes: Array[Byte]): QuantileSketch.State =
    QuantileSketch.deserializeState(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchMulti =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchMulti =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileSketchMulti =
    copy(child = newChildren.head)
}

object QuantileSketchMulti {

  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("q_sketch_multi"),
      new ExpressionInfo(classOf[QuantileSketchMulti].getName, "q_sketch_multi"),
      (children: Seq[Expression]) => {
        val ps = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.CreateArray(elems, _) =>
            elems.map(QuantileSketch.pLiteral(_, "q_sketch_multi"))
          case other => throw new IllegalArgumentException(
            s"q_sketch_multi probabilities must be an array(...) of DOUBLE " +
              s"literals, got $other")
        }
        QuantileSketchMulti(children.head, ps,
          QuantileSketch.capLiteral(children(2), "q_sketch_multi"))
      })
}

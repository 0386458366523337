package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, DoubleType}

/** HyperLogLog distinct-count sketch with an engine-defined, cross-engine
  * register layout — `hll_distinct(bigint)` returns the raw harmonic-mean
  * estimate `α·m² / Σ 2^(−M[j])` over `m = `[[HllSketch.M]] registers.
  *
  * Why a custom sketch next to Spark's `approx_count_distinct`: the built-in
  * HLL++ register layout is engine-private (its estimate is unreproducible
  * outside Spark — `q_an_approx_distinct` stays a rows-only check for that
  * reason), while training-data curation wants sketches that downstream
  * systems can recompute and audit.  Every step here is exact 64-bit integer
  * arithmetic, so an independent engine running the same spec produces
  * bit-identical registers AND a bit-identical double estimate (see
  * [[graft.ops.AnalyticsQueries.hllDistinctOracle]]):
  *
  *   x   = key & (2^31 − 1)                     then the murmur3 fmix32
  *   h   = x ^ (x >> 16)                        finalizer restricted to 31
  *   h   = (h · 0x85ebca6b) & (2^31 − 1)        bits — every multiply is
  *   h   = h ^ (h >> 13)                        ≤ (2^31−1)·0xc2b2ae35
  *   h   = (h · 0xc2b2ae35) & (2^31 − 1)        ≈ 7.0e18 < 2^63 − 1, so no
  *   h   = h ^ (h >> 16)                        engine ever wraps.  (A plain
  *                                              multiplicative mix mod p has
  *                                              degenerate trailing-zero
  *                                              dispersion on sequential
  *                                              keys: +90% error on TPC-H.)
  *   reg = h & 63,  w = h >> 6                  w < 2^25
  *   ρ   = w = 0 ? 26 : trailingZeros(w) + 1    M[reg] = max(M[reg], ρ)
  *
  * The estimate stays exact across engines because Σ 2^(−M[j]) is a sum of
  * m = 64 dyadic rationals with denominator ≤ 2^26 — representable without
  * rounding in a double for ANY summation order — and the final α·m²/S is a
  * single IEEE multiply+divide.  No bias/linear-counting corrections: they
  * need `ln`, whose libm rounding differs across engines; this returns the
  * raw HLL estimator and documents ±~13% (1.04/√64) standard error.
  *
  * Scale: the aggregation buffer is 64 bytes per group and [[merge]] is an
  * element-wise max — associative and commutative — so Spark runs it as a
  * map-side partial aggregate and the shuffle carries one sketch per
  * (partition, group), never raw keys.  That merge path IS the 100 TB
  * design: sketches from independent corpus shards union losslessly.
  *
  * Reference analogue: the reference has no sketches (exact COUNT DISTINCT
  * only, e.g. `kpi_receita_m_passado/transform.py` groupbys); this is part
  * of the beyond-reference analytics surface.
  */
case class HllSketch(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  import HllSketch._

  // Callers guarantee child: bigint (AbstractDataType/ExpectsInputTypes are
  // private[sql] in Spark 4 — no declarative input-type check, the
  // MinHashSignature convention).
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = child :: Nil
  override def prettyName: String = "hll_distinct"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var j = 0
    while (j < M) { if (b(j) > a(j)) a(j) = b(j); j += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = estimate(buf)

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllSketch =
    copy(child = newChildren.head)
}

object HllSketch {
  val M = 64                    // registers (p = 6)
  val Alpha = 0.709             // α_64, Flajolet et al. 2007, Fig. 3
  val MaxRho = 26               // w has 25 payload bits; w = 0 ⇒ ρ = 26

  /** One key into the registers — shared by [[HllSketch.update]] and specs.
    * The hash is the engine-wide [[Mix31]] chain. */
  def add(regs: Array[Byte], key: Long): Unit = {
    val h = Mix31.mix(key)
    val reg = (h & (M - 1)).toInt
    val w = h >>> 6
    val rho =
      if (w == 0L) MaxRho else java.lang.Long.numberOfTrailingZeros(w) + 1
    if (rho > regs(reg)) regs(reg) = rho.toByte
  }

  /** Raw harmonic-mean estimate — exact for a given register state in any
    * IEEE-double engine (see class doc). */
  def estimate(regs: Array[Byte]): Double = {
    var s = 0.0
    var j = 0
    while (j < M) { s += 1.0 / (1L << regs(j)); j += 1 }
    Alpha * M * M / s
  }

  /** Function description shared by per-session registration and the
    * [[graft.GraftExtensions]] injection path.  The analyzer wraps the bare
    * [[org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction]]
    * in an `AggregateExpression` itself, so `expr("hll_distinct(k)")` works
    * anywhere `sum(k)` would. */
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("hll_distinct"),
      new ExpressionInfo(classOf[HllSketch].getName, "hll_distinct"),
      (children: Seq[Expression]) => HllSketch(children.head))

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      description._1, description._2, description._3)
}

/** `hll_sketch_bytes(bigint) → BINARY`: the same registers as
  * [[HllSketch]], returned as the 64-byte register array instead of the
  * estimate — the PERSISTABLE half of the sketch API.  A warehouse stores
  * one sketch per (day, dimension) cell and answers any later
  * distinct-count question over any cell UNION by merging sketches
  * ([[HllMergeEst]]) without revisiting raw data — the pattern behind
  * every "rolling 7-day uniques" dashboard at 100 TB. */
case class HllSketchBytes(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  import HllSketch._

  override def dataType: DataType =
    org.apache.spark.sql.types.BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = child :: Nil
  override def prettyName: String = "hll_sketch_bytes"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var j = 0
    while (j < M) { if (b(j) > a(j)) a(j) = b(j); j += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = buf.clone()

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketchBytes =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketchBytes =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllSketchBytes =
    copy(child = newChildren.head)
}

object HllSketchBytes {
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("hll_sketch_bytes"),
      new ExpressionInfo(classOf[HllSketchBytes].getName, "hll_sketch_bytes"),
      (children: Seq[Expression]) => HllSketchBytes(children.head))

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      description._1, description._2, description._3)
}

/** `hll_merge_est(binary) → DOUBLE`: merge stored [[HllSketchBytes]]
  * sketches (elementwise register max — lossless union) and return the
  * [[HllSketch.estimate]] of the merged state.  Merging N sketches costs
  * O(N·64) bytes of work regardless of the raw cardinalities underneath —
  * re-aggregation without re-scanning. */
case class HllMergeEst(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  import HllSketch._

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = child :: Nil
  override def prettyName: String = "hll_merge_est"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val regs = v.asInstanceOf[Array[Byte]]
      require(regs.length == M,
        s"hll_merge_est expects a $M-byte hll_sketch_bytes payload")
      var j = 0
      while (j < M) { if (regs(j) > buf(j)) buf(j) = regs(j); j += 1 }
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var j = 0
    while (j < M) { if (b(j) > a(j)) a(j) = b(j); j += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = estimate(buf)

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllMergeEst =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllMergeEst =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllMergeEst =
    copy(child = newChildren.head)
}

object HllMergeEst {
  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("hll_merge_est"),
      new ExpressionInfo(classOf[HllMergeEst].getName, "hll_merge_est"),
      (children: Seq[Expression]) => HllMergeEst(children.head))

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      description._1, description._2, description._3)
}

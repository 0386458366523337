package graft

import scala.collection.mutable.ArrayBuffer

import graft.functions.{Mix31, QuantileSketch}

/** QuantileSketch beyond the driver gate's exact regime: compaction error
  * bounds, merge-order robustness, and serialization. */
class QuantileSketchSpec extends SparkSpec {

  private def freshState() =
    new QuantileSketch.State(ArrayBuffer(ArrayBuffer.empty[Long]))

  private def vals(n: Int): Seq[Long] =
    (0 until n).map(j => Mix31.mix(j.toLong)) // deterministic shuffled order

  /** Exact discrete quantile per the sketch's spec: ⌈p·n⌉-th smallest. */
  private def exactQ(xs: Seq[Long], p: Double): Long = {
    val sorted = xs.sorted
    sorted((math.max(1L, math.ceil(p * xs.length).toLong) - 1).toInt)
  }

  /** Rank displacement of `est` from the target rank, in [0, 1]. */
  private def rankError(xs: Seq[Long], est: Long, p: Double): Double = {
    val sorted = xs.sorted
    val below = sorted.count(_ < est)
    val atOrBelow = sorted.count(_ <= est)
    val target = math.ceil(p * xs.length)
    // est covers ranks (below, atOrBelow]; distance from the band to target.
    val d =
      if (target < below + 1) below + 1 - target
      else if (target > atOrBelow) target - atOrBelow
      else 0.0
    d / xs.length
  }

  test("exact regime: sketch equals the rank-walk definition") {
    val xs = vals(1000)
    val st = freshState()
    xs.foreach(st.add(_, 4096))
    for (p <- Seq(0.01, 0.25, 0.5, 0.75, 0.99, 1.0)) {
      assert(st.quantile(p) === exactQ(xs, p), s"p=$p")
    }
  }

  test("compacted regime: rank error <= 2% at n = 64 * cap") {
    val cap = 256
    val xs = vals(64 * cap)
    val st = freshState()
    xs.foreach(st.add(_, cap))
    // The state is genuinely compacted, not a big exact buffer.
    assert(st.levels.length > 1)
    assert(st.levels.map(_.length).sum < xs.length / 8)
    for (p <- Seq(0.1, 0.25, 0.5, 0.75, 0.9)) {
      val est = st.quantile(p).asInstanceOf[Long]
      assert(rankError(xs, est, p) <= 0.02, s"p=$p")
    }
  }

  test("merge order does not break the band") {
    val cap = 256
    val xs = vals(32 * cap)
    val chunks = xs.grouped(xs.length / 8 + 1).toSeq
    def stateOf(c: Seq[Long]) = {
      val s = freshState(); c.foreach(s.add(_, cap)); s
    }
    val left = chunks.map(stateOf).reduceLeft { (a, b) => a.mergeIn(b, cap); a }
    val right = chunks.map(stateOf).reduceRight { (a, b) => b.mergeIn(a, cap); b }
    for (p <- Seq(0.25, 0.5, 0.75); st <- Seq(left, right)) {
      val est = st.quantile(p).asInstanceOf[Long]
      assert(rankError(xs, est, p) <= 0.02, s"p=$p")
    }
    assert(left.totalWeight === xs.length.toLong)
    assert(right.totalWeight === xs.length.toLong)
  }

  test("SQL path: exact regime across partitions, null on empty") {
    import spark.implicits._
    QuantileSketch.register(spark)
    val xs = vals(2000)
    val df = xs.toDF("v").repartition(8)
    val got = df.selectExpr(
      "q_sketch(v, 0.5D, 4096) AS p50",
      "q_sketch(v, 0.25D, 4096) AS p25").head()
    assert(got.getLong(0) === exactQ(xs, 0.5))
    assert(got.getLong(1) === exactQ(xs, 0.25))
    val empty = spark.emptyDataset[Long].toDF("v")
      .selectExpr("q_sketch(v, 0.5D, 4096) AS p50").head()
    assert(empty.isNullAt(0))
  }
}

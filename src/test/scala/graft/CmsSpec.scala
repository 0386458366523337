package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.CmsFreq

/** Count-Min sketch as a counter table: the one-sided-error guarantee,
  * cell-wise shard merging, the exact regime on a lone key, and the
  * approximate regime genuinely engaged on the real corpus. */
class CmsSpec extends SparkSpec {

  import spark.implicits._

  private def keysDf(ks: Seq[Long]): DataFrame = ks.toDF("k")

  private def estimates(stream: Seq[Long], probes: Seq[Long]): Map[Long, Long] =
    CmsFreq.estimatesOf(CmsFreq.countersOf(keysDf(stream)),
        keysDf(probes.distinct))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a lone key's estimate is exact: its cells hold only its mass") {
    val est = estimates(Seq.fill(7)(42L), Seq(42L))
    assert(est(42L) === 7L)
  }

  test("estimates never undercount (one-sided error), any key mix") {
    val stream = (0L until 500L).flatMap(k => Seq.fill((k % 5 + 1).toInt)(k))
    val exact = stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val est = estimates(stream, stream.distinct)
    exact.foreach { case (k, n) => assert(est(k) >= n, s"key $k") }
    // 500 distinct keys over 64 buckets: the fixture (hash chain is
    // fixed) also exercises the approximate side of the one-sided bound.
    assert(exact.exists { case (k, n) => est(k) > n })
  }

  test("shard grids merge cell-wise into the whole-stream grid") {
    val stream = (0L until 300L).map(k => k % 37)
    val (a, b) = stream.splitAt(140)
    val whole = CmsFreq.countersOf(keysDf(stream))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = CmsFreq.countersOf(keysDf(a))
      .unionAll(CmsFreq.countersOf(keysDf(b)))
      .groupBy(col("i"), col("b")).agg(sum(col("c")).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged === whole)
  }

  test("the registered query's gate regime is genuinely approximate") {
    // At the driver-gate scale (sf0.01: 150 users into W = 64 buckets)
    // some probe must overcount — otherwise the gate would be silently
    // pinning only the trivial exact regime.  sf0.001's 15 users are too
    // sparse to collide in all D rows, which is itself the dual-regime
    // story: the same query is exact there and approximate at the gate.
    val rows = CmsFreq.cmsFreq(spark, "/root/testdata/sf0.01").collect()
    assert(rows.length === 10)
    assert(rows.forall(_.getBoolean(3)), "overcount_ok must hold everywhere")
    assert(rows.exists(r => r.getLong(2) > r.getLong(1)),
      "no probe overcounted: the sketch is not in its approximate regime")
  }

  test("estimates are deterministic across reruns") {
    val a = CmsFreq.cmsFreq(spark, Sf001).collect().map(_.toString).sorted
    val b = CmsFreq.cmsFreq(spark, Sf001).collect().map(_.toString).sorted
    assert(a.toSeq === b.toSeq)
  }

  /** Inner product of two grids the way [[CmsFreq.joinSize]] computes it. */
  private def gridInnerProduct(a: Seq[Long], b: Seq[Long]): Long = {
    val ga = CmsFreq.countersOf(keysDf(a))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val gb = CmsFreq.countersOf(keysDf(b))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    (0 until CmsFreq.D).map { i =>
      ga.collect { case ((gi, bk), c) if gi == i =>
        c * gb.getOrElse((i, bk), 0L)
      }.sum
    }.min
  }

  test("join-size inner product is exact for a lone shared key") {
    // One key on both sides: every cell of every row holds only its own
    // cross mass, so min over rows is exactly f_A · f_B.
    assert(gridInnerProduct(Seq.fill(3)(42L), Seq.fill(5)(42L)) === 15L)
  }

  test("join-size estimate never undercounts the true join cardinality") {
    val a = (0L until 200L).flatMap(k => Seq.fill((k % 3 + 1).toInt)(k))
    val b = (100L until 300L).flatMap(k => Seq.fill((k % 2 + 1).toInt)(k))
    val fa = a.groupBy(identity).view.mapValues(_.size.toLong)
    val fb = b.groupBy(identity).view.mapValues(_.size.toLong)
    val exact = fa.keys.toSeq.map(k => fa(k) * fb.getOrElse(k, 0L)).sum
    assert(gridInnerProduct(a, b) >= exact)
  }

  test("the registered join-size query holds its one-sided contract") {
    val r = CmsFreq.joinSize(spark, "/root/testdata/sf0.01").collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getBoolean(row.fieldIndex("overcount_ok")))
    val exact = row.getLong(row.fieldIndex("exact_join_rows"))
    val est = row.getLong(row.fieldIndex("cms_est"))
    assert(est >= exact && exact > 0)
    // 150 users over 64 buckets collide: the gate scale must exercise
    // the genuinely approximate regime, not the trivial exact one.
    assert(est > exact, "estimate equals exact: approximate regime not engaged")
  }
}

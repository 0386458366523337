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
}

package graft

import org.apache.spark.sql.functions._

import graft.functions.HllSketch

class HllSketchSpec extends SparkSpec {
  import spark.implicits._

  private def estimateOf(keys: Seq[Long], partitions: Int): Double = {
    HllSketch.register(spark)
    keys.toDF("k").repartition(partitions)
      .agg(expr("hll_distinct(k)").as("est"))
      .collect().head.getDouble(0)
  }

  test("aggregate matches the pure-Scala kernel exactly") {
    val keys = (1L to 5000L).map(_ * 13 + 7)
    val regs = new Array[Byte](HllSketch.M)
    keys.foreach(HllSketch.add(regs, _))
    assert(estimateOf(keys, 8) == HllSketch.estimate(regs))
  }

  test("estimate is invariant under partitioning (merge is an elementwise max)") {
    val keys = (1L to 3000L) ++ (1L to 1500L) // duplicates must not matter
    val a = estimateOf(keys, 1)
    val b = estimateOf(keys, 7)
    val c = estimateOf(keys, 32)
    assert(a == b && b == c, s"partition-dependent estimates: $a $b $c")
  }

  test("estimate lands within the HLL error band on distinct-heavy input") {
    // 1.04/sqrt(64) = 13% standard error; allow 3 sigma.
    for (n <- Seq(1000, 10000, 100000)) {
      val est = estimateOf((1L to n.toLong), 16)
      assert(math.abs(est / n - 1) < 0.39, s"n=$n est=$est")
    }
  }

  test("nulls are ignored, empty input estimates ~zero registers") {
    HllSketch.register(spark)
    val est = Seq[Option[Long]](None, None).toDF("k")
      .agg(expr("hll_distinct(k)")).collect().head.getDouble(0)
    // All 64 registers empty: alpha * 64^2 / 64 = 45.376 — the raw
    // estimator's floor (production would linear-count below 2.5m; kept
    // raw for cross-engine exactness, see HllSketch scaladoc).
    assert(est == HllSketch.estimate(new Array[Byte](HllSketch.M)))
  }

  test("stored-sketch merge is lossless: merge(sketch(A), sketch(B)) == sketch(A ∪ B)") {
    graft.functions.HllSketchBytes.register(spark)
    graft.functions.HllMergeEst.register(spark)
    val df = (1L to 5000L).map(k => (k % 7, k)).toDF("g", "k")
    // Per-group stored sketches, then merged across groups...
    val merged = df.groupBy($"g").agg(expr("hll_sketch_bytes(k)").as("sk"))
      .agg(expr("hll_merge_est(sk)")).collect().head.getDouble(0)
    // ...must equal the single-pass estimate over the union.
    val direct = df.agg(expr("hll_distinct(k)")).collect().head.getDouble(0)
    assert(merged == direct,
      "register union must be indistinguishable from one-pass sketching")
    // And the merge-of-one roundtrips the bytes faithfully.
    val one = df.filter($"g" === 0)
    val viaBytes = one.agg(expr("hll_sketch_bytes(k)").as("sk"))
      .agg(expr("hll_merge_est(sk)")).collect().head.getDouble(0)
    val plain = one.agg(expr("hll_distinct(k)")).collect().head.getDouble(0)
    assert(viaBytes == plain)
  }
}

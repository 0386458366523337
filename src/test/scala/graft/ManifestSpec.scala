package graft

import org.apache.spark.sql.functions._

import graft.core.{Manifest, Sinks, Sources}

/** Manifest skipping: the driver gate proves result correctness; these
  * specs prove files are actually SKIPPED (the point of the operator) and
  * that the manifest is a faithful file-level summary. */
class ManifestSpec extends SparkSpec {

  private val staged = "/tmp/graft_manifest_spec/orders_sorted"

  private def stage(files: Int): Unit =
    Sinks.overwriteSorted(Sources.orders(spark, Sf001), staged,
      Seq("o_orderkey"), files)

  test("manifest is one faithful row per data file") {
    stage(8)
    val m = Manifest.build(spark, staged, "o_orderkey").collect()
    assert(m.length === Sinks.dataFiles(spark, staged).size)
    val table = Sources.orders(spark, Sf001)
    assert(m.map(_.getAs[Long]("rows")).sum === table.count())
    assert(m.map(_.getAs[Long]("lo")).min ===
      table.agg(min("o_orderkey")).head().getLong(0))
    assert(m.map(_.getAs[Long]("hi")).max ===
      table.agg(max("o_orderkey")).head().getLong(0))
    // Sorted staging ⇒ file ranges are pairwise disjoint.
    val ranges = m.map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi")))
      .sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2)
      case _ =>
    }
  }

  test("a narrow range opens strictly fewer files than exist") {
    stage(8)
    // 1500 keys over 8 sorted files ⇒ ~188 keys per file; a 150-key range
    // intersects at most 2.
    val keep = Manifest.prunedFiles(spark, staged, "o_orderkey", 600, 749)
    assert(keep.nonEmpty)
    assert(keep.size <= 2, s"expected <=2 files, pruned set: ${keep.size}")
    assert(keep.size < Sinks.dataFiles(spark, staged).size)
  }

  test("pruned aggregate equals the full-scan filtered aggregate") {
    val got = Manifest.prunedAgg(spark, Sf001, lo = 600, hi = 749)
    val want = Sources.orders(spark, Sf001)
      .filter(col("o_orderkey").between(600, 749))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"))
    val g = got.select("o_orderstatus", "n_orders").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val w = want.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(g === w)
  }

  test("boundary rows survive pruning (file grain vs row grain)") {
    stage(8)
    val m = Manifest.build(spark, staged, "o_orderkey").collect()
    // Pick a range that STARTS exactly at some file's hi: the previous
    // file must still be opened for that single row.
    val cut = m.map(_.getAs[Long]("hi")).sorted.apply(2)
    val keep = Manifest.prunedFiles(spark, staged, "o_orderkey", cut, cut + 50)
    val rows = spark.read.parquet(keep: _*)
      .filter(col("o_orderkey").between(cut, cut + 50)).count()
    assert(rows === 51L, "the boundary key itself must be readable")
  }
}

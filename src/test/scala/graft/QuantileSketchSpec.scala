package graft

import scala.collection.mutable.ArrayBuffer

import graft.functions.{Mix31, QuantileSketch}

/** QuantileSketch beyond the driver gate's exact regime: compaction error
  * bounds, merge-order robustness, and serialization. */
class QuantileSketchSpec extends SparkSpec {

  private def freshState() = QuantileSketch.emptyState()

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

  test("multi form: each element equals the corresponding q_sketch call") {
    import spark.implicits._
    QuantileSketch.register(spark)
    val ps = Seq(0.1, 0.25, 0.5, 0.75, 0.9)
    // Exact regime: multi ≡ single ≡ rank walk, bit-for-bit.
    val xs = vals(2000)
    val exact = xs.toDF("v").repartition(8).selectExpr(
      "q_sketch_multi(v, array(0.1D, 0.25D, 0.5D, 0.75D, 0.9D), 4096) AS qs")
      .head().getSeq[Long](0)
    assert(exact == ps.map(exactQ(xs, _)))
    // Compacted regime: multi and single share one State implementation,
    // so every element must equal the standalone aggregate at the same cap
    // (single partition pins the update order for both).
    val big = vals(64 * 256)
    val both = big.toDF("v").coalesce(1).selectExpr(
      "q_sketch_multi(v, array(0.25D, 0.75D), 256) AS qs",
      "q_sketch(v, 0.25D, 256) AS q25",
      "q_sketch(v, 0.75D, 256) AS q75").head()
    assert(both.getSeq[Long](0) == Seq(both.getLong(1), both.getLong(2)))
    val empty = spark.emptyDataset[Long].toDF("v")
      .selectExpr("q_sketch_multi(v, array(0.5D), 4096) AS qs").head()
    assert(empty.isNullAt(0))
  }

  test("multi form: merge order keeps every element in the band") {
    val cap = 256
    val xs = vals(32 * cap)
    val chunks = xs.grouped(xs.length / 8 + 1).toSeq
    def stateOf(c: Seq[Long]) = {
      val s = freshState(); c.foreach(s.add(_, cap)); s
    }
    val merged = chunks.map(stateOf).reduceLeft { (a, b) => a.mergeIn(b, cap); a }
    // One state answers all probes — the single-buffer point of the multi
    // form — and each answer meets the same band as a dedicated sketch.
    for (p <- Seq(0.1, 0.25, 0.5, 0.75, 0.9)) {
      val est = merged.quantile(p).asInstanceOf[Long]
      assert(rankError(xs, est, p) <= 0.02, s"p=$p")
    }
  }

  test("registered capped regime (cap=1024, n~2k and ~20k): compaction fires, band holds") {
    // The q_an_quantile_sketch_capped gate entry runs cap = 1024 over
    // ~2k-row (sf0.01) and ~20k-row (sf0.1) groups; this pins, at exactly
    // that configuration, that (a) the sketch genuinely leaves the exact
    // regime — the driver entry tests compaction, not a big exact buffer —
    // and (b) the ±2% rank band the entry's boolean asserts actually holds.
    for (n <- Seq(2000, 20000)) {
      val cap = 1024
      val xs = vals(n)
      val st = freshState()
      xs.foreach(st.add(_, cap))
      assert(st.levels.length > 1, s"compaction must fire at n=$n")
      assert(st.levels(1).nonEmpty, s"promoted items must exist at n=$n")
      for (p <- Seq(0.25, 0.5, 0.75)) {
        val est = st.quantile(p).asInstanceOf[Long]
        assert(rankError(xs, est, p) <= 0.02, s"n=$n p=$p")
      }
    }
  }

  test("adaptive cap rule: exact to the ceiling, bounded beyond, guard refuses") {
    import graft.ops.AnalyticsQueries._
    // Exact regime: cap = max(floor, group size) — zero compaction.
    assert(adaptiveSketchCap(0) === SketchMinCap)
    assert(adaptiveSketchCap(1023) === SketchMinCap)
    assert(adaptiveSketchCap(1025) === 1025)
    assert(adaptiveSketchCap(200125) === 200125) // sf0.1 lineitem flag group
    assert(adaptiveSketchCap(2001250) === 2001250) // sf1
    assert(adaptiveSketchCap(SketchExactCapMax) === SketchExactCapMax)
    // Past the ceiling: the bounded production cap, a constant.
    assert(adaptiveSketchCap(SketchExactCapMax + 1L) === SketchBoundedCap)
    assert(adaptiveSketchCap(20012500L) === SketchBoundedCap) // sf10
    assert(adaptiveSketchCap(Long.MaxValue / 2) === SketchBoundedCap)
    // Manual caps: adaptive sentinel, >= needed passes, undersized refuses
    // naming the fix (the semanticDedup guard recipe).
    assert(sketchCapFor(200125, 0, "t") === 200125)
    assert(sketchCapFor(200125, 1 << 20, "t") === (1 << 20))
    val e = intercept[IllegalArgumentException] {
      sketchCapFor(200125, 1024, "t")
    }
    assert(e.getMessage.contains("adaptive"))
  }

  test("adaptiveCapSql agrees with adaptiveSketchCap on DuckDB, " +
      "including the empty scope") {
    import graft.ops.AnalyticsQueries._
    // r13 ADVICE #1: MAX(c) over ZERO groups is SQL NULL; the un-COALESCEd
    // CASE fell to the bounded branch (16384) while the Scala spelling
    // returns the exact-regime floor (1024).  Pin cross-engine agreement
    // on the empty edge AND around both regime boundaries.
    val loaded =
      try { Class.forName("org.duckdb.DuckDBDriver"); true }
      catch { case _: ClassNotFoundException => false }
    assume(loaded, "duckdb_jdbc not on the test classpath")
    val con = java.sql.DriverManager.getConnection("jdbc:duckdb:")
    try {
      val st = con.createStatement()
      // The empty scope, spelled the way every cap oracle spells it.
      st.execute("CREATE TABLE empty_ev(event_type VARCHAR, v BIGINT)")
      val emptyG =
        "SELECT MAX(c) FROM (SELECT COUNT(*) AS c FROM empty_ev GROUP BY event_type) _e"
      def sqlCap(gSql: String): Long = {
        val rs = st.executeQuery(s"SELECT ${adaptiveCapSql(gSql)}")
        rs.next(); val v = rs.getLong(1); rs.close(); v
      }
      assert(sqlCap(emptyG) === adaptiveSketchCap(0).toLong)
      for (g <- Seq(0L, 1L, 1023L, 1024L, 1025L, 200125L,
          SketchExactCapMax.toLong, SketchExactCapMax + 1L, 20012500L))
        assert(sqlCap(s"SELECT CAST($g AS BIGINT)") ===
          adaptiveSketchCap(g).toLong, s"g=$g")
    } finally con.close()
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

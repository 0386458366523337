package graft

import org.apache.spark.sql.functions._

import graft.functions.LongProductSum

/** `bigprodsum` (LongProductSum) must be value-identical to
  * `SUM(CAST(a AS DECIMAL(19,0)) * CAST(b AS DECIMAL(19,0)))` — the
  * contract that lets the gini/hhi oracles keep their DECIMAL-product
  * spelling while the engine's hot path multiplies in 64-bit. */
class LongProductSumSpec extends SparkSpec {
  import spark.implicits._

  private def registered(): Unit = LongProductSum.register(spark)

  private def decSum =
    "SUM(CAST(a AS DECIMAL(19,0)) * CAST(b AS DECIMAL(19,0)))"

  private def check(vs: Seq[(Option[Long], Option[Long])],
      parts: Int = 4): Unit = {
    registered()
    val df = vs.toDF("a", "b").repartition(parts)
    val r = df.selectExpr("bigprodsum(a, b) AS p", s"$decSum AS s").first()
    assert(r.isNullAt(0) === r.isNullAt(1), s"null-ness diverged on $vs")
    if (!r.isNullAt(0))
      assert(r.getDecimal(0).compareTo(r.getDecimal(1)) === 0,
        s"bigprodsum=${r.getDecimal(0)} sum=${r.getDecimal(1)}")
  }

  test("randomized inputs match SUM(DECIMAL product) across partitionings") {
    val rnd = new scala.util.Random(42)
    for (parts <- Seq(1, 3, 7)) {
      val vs = Seq.fill(5000)(
        (Some(rnd.nextLong() % (1L << 24)), Some(rnd.nextLong() % (1L << 24))))
      check(vs, parts)
    }
  }

  test("guard boundary: operands straddling ⌊√2^61⌋ split fast/bypass") {
    val s = 1518500249L // ⌊√2^61⌋: both within -> long path, else decimal
    check(Seq(
      (Some(s), Some(s)), (Some(s + 1), Some(s)), (Some(s), Some(s + 1)),
      (Some(-s), Some(s)), (Some(-(s + 1)), Some(-(s + 1))),
      (Some(Long.MaxValue / 2), Some(3L)), (Some(2L), Some(Long.MinValue / 2)),
      (Some(17L), Some(-29L))))
    // Repeated near-ceiling products spill the run accumulator on almost
    // every update; mixed signs walk it across zero.
    check(Seq.fill(64)((Some(s - 1), Some(s - 1))) ++
      Seq.fill(64)((Some(-(s - 1)), Some(s - 1))), parts = 2)
  }

  test("NULLs are ignored; all-NULL and empty groups yield NULL") {
    check(Seq((Some(5L), None), (None, Some(7L)), (Some(3L), Some(-4L)),
      (None, None)))
    check(Seq((None, None), (Some(1L), None)))
    registered()
    val empty = spark.emptyDataset[(Long, Long)].toDF("a", "b")
    assert(empty.selectExpr("bigprodsum(a, b)").first().isNullAt(0))
  }

  test("grouped aggregation matches per group and survives ANSI mode") {
    registered()
    val rnd = new scala.util.Random(7)
    val df = (1 to 4000)
      .map(i => (i % 5, rnd.nextLong() % (1L << 20), rnd.nextLong() % (1L << 20)))
      .toDF("k", "a", "b").repartition(6)
    for (ansi <- Seq(true, false)) withAnsi(ansi) {
      val got = df.groupBy("k")
        .agg(expr("bigprodsum(a, b)").as("p"), expr(decSum).as("s"))
        .collect()
      assert(got.length === 5)
      got.foreach(r =>
        assert(r.getDecimal(1).compareTo(r.getDecimal(2)) === 0,
          s"k=${r.getInt(0)} ansi=$ansi"))
    }
  }

  test("update path stays inside whole-stage codegen") {
    registered()
    val df = (1L to 100L).map(v => (v, v)).toDF("a", "b")
      .groupBy().agg(expr("bigprodsum(a, b)"))
    df.collect() // finalize the AQE plan — WSCG spans only exist post-run
    val plan = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) HashAggregate""".r.findFirstIn(plan).isDefined, plan)
    assert(!plan.contains("ObjectHashAggregate"), plan)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.functions.LongExactSum

/** `bigsum` (LongExactSum) must be value-identical to
  * `SUM(CAST(v AS DECIMAL(38,0)))` — the contract that lets the corr
  * family's oracle keep its plain-SUM spelling. */
class LongExactSumSpec extends SparkSpec {
  import spark.implicits._

  private def registered(): Unit = LongExactSum.register(spark)

  private def decSum = "SUM(CAST(v AS DECIMAL(38,0)))"

  private def check(vs: Seq[Option[Long]], parts: Int = 4): Unit = {
    registered()
    val df = vs.toDF("v").repartition(parts)
    val r = df.selectExpr(s"bigsum(v) AS b", s"$decSum AS s").first()
    assert(r.isNullAt(0) === r.isNullAt(1), s"null-ness diverged on $vs")
    if (!r.isNullAt(0))
      assert(r.getDecimal(0).compareTo(r.getDecimal(1)) === 0,
        s"bigsum=${r.getDecimal(0)} sum=${r.getDecimal(1)}")
  }

  test("randomized inputs match SUM(DECIMAL) across partitionings") {
    val rnd = new scala.util.Random(42)
    for (parts <- Seq(1, 3, 7)) {
      val vs = Seq.fill(5000)(Some(rnd.nextLong() % (1L << 48)))
      check(vs, parts)
    }
  }

  test("spill boundary: values near ±2^61 force the decimal path") {
    val t = 1L << 61
    // Repeated near-ceiling values spill on almost every update; mixed
    // signs walk the run accumulator across zero; giant inputs (> 2^61)
    // take the bypass branch.
    check(Seq(t - 1, t - 1, t - 1, -(t - 1), t / 2, -(t / 2),
      Long.MaxValue / 2, -(Long.MaxValue / 2), 17L, -17L).map(Some(_)))
    check(Seq.fill(64)(Some(t - 3)), parts = 2)
  }

  test("NULLs are ignored; all-NULL and empty groups yield NULL") {
    check(Seq(Some(5L), None, Some(-7L), None))
    check(Seq(None, None))
    registered()
    val empty = spark.emptyDataset[Long].toDF("v")
    assert(empty.selectExpr("bigsum(v)").first().isNullAt(0))
  }

  test("grouped aggregation matches per group and survives ANSI mode") {
    registered()
    val rnd = new scala.util.Random(7)
    val df = (1 to 4000)
      .map(i => (i % 5, rnd.nextLong() % (1L << 40)))
      .toDF("k", "v").repartition(6)
    for (ansi <- Seq(true, false)) withAnsi(ansi) {
      val got = df.groupBy("k")
        .agg(expr("bigsum(v)").as("b"), expr(decSum).as("s"))
        .collect()
      assert(got.length === 5)
      got.foreach(r =>
        assert(r.getDecimal(1).compareTo(r.getDecimal(2)) === 0,
          s"k=${r.getInt(0)} ansi=$ansi"))
    }
  }

  test("update path stays inside whole-stage codegen") {
    registered()
    val df = (1L to 100L).toDF("v").groupBy().agg(expr("bigsum(v)"))
    df.collect() // finalize the AQE plan — WSCG spans only exist post-run
    val plan = df.queryExecution.executedPlan.toString
    // The aggregate must run as a codegen'd HashAggregate (the `*(n)`
    // stage marker in toString IS the WholeStageCodegen span) — a
    // codegen-ineligible aggregate would fall back to ObjectHashAggregate
    // or interpreted mode and lose the long-add fast path's point.
    assert("""\*\(\d+\) HashAggregate""".r.findFirstIn(plan).isDefined, plan)
    assert(!plan.contains("ObjectHashAggregate"), plan)
  }
}

package graft

import graft.ops.AnalyticsQueries

/** The exact-moments least-squares fit vs an independent brute-force
  * regression, plus the degenerate regimes the NULLIF guards. */
class LinearTrendSpec extends SparkSpec {

  test("slope/intercept match a brute-force least-squares fit") {
    val pts = graft.core.Sources.lineitem(spark, Sf001)
      .selectExpr("l_returnflag",
        "DATEDIFF(CAST(l_shipdate AS DATE), DATE '1995-01-01') AS d",
        "CAST(l_extendedprice AS DECIMAL(18,2)) AS cents")
      .collect()
      .map(r => (r.getString(0), r.getInt(1).toDouble,
        r.getDecimal(2).doubleValue()))

    val want = pts.groupBy(_._1).map { case (flag, rows) =>
      val n = rows.length.toDouble
      val mx = rows.map(_._2).sum / n
      val my = rows.map(_._3).sum / n
      val sxx = rows.map(p => (p._2 - mx) * (p._2 - mx)).sum
      val sxy = rows.map(p => (p._2 - mx) * (p._3 - my)).sum
      flag -> (sxy / sxx, my - (sxy / sxx) * mx)
    }

    val got = AnalyticsQueries.linearTrend(spark, Sf001).collect()
      .map(r => r.getString(0) ->
        (r.getDouble(r.fieldIndex("slope_per_day")),
          r.getDouble(r.fieldIndex("intercept")))).toMap

    assert(got.keySet === want.keySet)
    want.foreach { case (flag, (s, i)) =>
      // Centered vs raw-moment formulations agree to rounding noise;
      // the registered output is pinned at 6 dp.
      assert(math.abs(got(flag)._1 - s) < 1e-3, s"slope $flag")
      assert(math.abs(got(flag)._2 - i) < 1e-1, s"intercept $flag")
    }
  }

  test("single-day group yields NULL slope and intercept, not an ANSI error") {
    import spark.implicits._
    // cents is the money×100 BIGINT convention (trendOf's input contract).
    val oneDay = Seq(("A", 7, 10000L), ("A", 7, 30000L))
      .toDF("l_returnflag", "d", "cents")
    val row = AnalyticsQueries.trendOf(oneDay).collect().head
    assert(row.getLong(row.fieldIndex("n")) === 2L)
    assert(row.isNullAt(row.fieldIndex("slope_per_day")))
    assert(row.isNullAt(row.fieldIndex("intercept")))
  }

  test("two exact points recover the line through them") {
    import spark.implicits._
    // y = 50*x + 100 (money) through (0, 100.00) and (10, 600.00):
    // integer-exact fit, cents scale divided back out by the formula.
    val pts = Seq(("B", 0, 10000L), ("B", 10, 60000L))
      .toDF("l_returnflag", "d", "cents")
    val row = AnalyticsQueries.trendOf(pts).collect().head
    assert(row.getDouble(row.fieldIndex("slope_per_day")) === 50.0)
    assert(row.getDouble(row.fieldIndex("intercept")) === 100.0)
  }

  test("day-grain pre-aggregation: one partial-agg pair below the moment agg") {
    // The r12 verdict-#4 shape: the fact scan folds to (flag, day) grain
    // in pure BIGINT before any DECIMAL appears, so the per-row hot path
    // carries no BigDecimal ops.  Two aggregates must stack in the plan.
    val plan = AnalyticsQueries.linearTrend(spark, Sf001)
      .queryExecution.executedPlan.toString
    val aggs = "HashAggregate".r.findAllIn(plan).length
    assert(aggs >= 4, s"expected stacked day-grain + moment aggregates:\n$plan")
    assert(!plan.toLowerCase.contains("decimal(18,0)"),
      "per-row decimal moment chain should be gone")
  }
}

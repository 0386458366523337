package graft

import graft.ops.OperatorQueries

/** Plan-shape contracts for the TPC-H-shaped multi-join queries: the
  * properties that matter at 100 TB (pushdown, broadcast choice, top-k
  * without a global sort) pinned so a regression fails CI rather than
  * silently shipping a bad plan. */
class MultiJoinPlanSpec extends SparkSpec {

  test("mjoin top-k: date filters reach the scans, top-10 is a heap not a sort") {
    val df = OperatorQueries.mjoinTopK(spark, Sf001)
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must run as per-partition heaps:\n$plan")
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // Both fact scans must carry their date predicate as PushedFilters.
    assert(formatted.contains("GreaterThan(l_shipdate"),
      "l_shipdate cutoff must reach the lineitem scan")
    assert(formatted.contains("LessThan(o_orderdate"),
      "o_orderdate cutoff must reach the orders scan")
  }

  test("snowflake: every dimension broadcasts, no cartesian anywhere") {
    val df = OperatorQueries.snowflakeAgg(spark, Sf001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"dims must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"))
    // The supplier join carries BOTH conditions (suppkey equi + same-nation
    // residual or composite key) — row counts prove it wasn't dropped:
    // every result nation is inside the chosen region.
    val nations = df.collect().map(_.getString(0)).toSet
    val regionNations = graft.core.Sources.nation(spark, Sf001)
      .join(graft.core.Sources.region(spark, Sf001)
          .filter(org.apache.spark.sql.functions.col("r_name") === "ASIA"),
        org.apache.spark.sql.functions.col("n_regionkey") ===
          org.apache.spark.sql.functions.col("r_regionkey"))
      .select("n_name").collect().map(_.getString(0)).toSet
    assert(nations.subsetOf(regionNations))
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.core.{Bucketed, Frag, Sources}

/** The bucketed co-located join: result-invariance vs the plain join and
  * the reason it exists — the join runs with no exchange under it. */
class BucketedSpec extends SparkSpec {

  test("bucketed join result is bit-identical to the plain-parquet join") {
    val got = Bucketed.bucketedJoin(spark, Sf001)
      .orderBy("l_returnflag", "o_orderpriority").collect().toSeq
    val want = Sources.lineitem(spark, Sf001)
      .join(Sources.orders(spark, Sf001),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag", "o_orderpriority")
      .agg(expr(Frag.sumMoney(Frag.money("l_extendedprice"))).as("receita"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag", "o_orderpriority").collect().toSeq
    assert(got === want)
  }

  test("the join is sort-merge with zero exchange below it; one agg exchange total") {
    val plan = Bucketed.bucketedJoin(spark, Sf001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles === 1,
      s"bucketed join must leave only the agg exchange, saw $shuffles:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
      !plan.contains("Exchange hashpartitioning(o_orderkey"),
      s"no shuffle may sit on the join key:\n$plan")
  }

  test("staging is once per JVM: a second call reuses the same catalog tables") {
    val before = spark.catalog.listTables().count()
    Bucketed.bucketedJoin(spark, Sf001).collect()
    Bucketed.bucketedJoin(spark, Sf001).collect()
    assert(spark.catalog.listTables().count() === before)
  }
}

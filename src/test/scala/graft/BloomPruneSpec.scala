package graft

import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join}
import org.apache.spark.sql.functions._

import graft.ops.BloomPrune

/** The bloom semi-join reduction: result-invariance vs the plain join,
  * no-false-negative / actually-prunes bounds on the filter itself, and
  * the plan shape that makes it worth having — the probe pushed below
  * the join onto the fact side. */
class BloomPruneSpec extends SparkSpec {

  private val (dimView, factView) = BloomPrune.viewNames(Sf001)

  private def probeCountSql(pred: String) =
    s"""SELECT COUNT(*) FROM $factView l $pred""".stripMargin

  test("bloom-pruned aggregate is bit-identical to the plain join") {
    val got = BloomPrune.bloomPrune(spark, Sf001)
      .orderBy("l_returnflag").collect().toSeq
    val want = graft.core.Sources.lineitem(spark, Sf001)
      .join(graft.core.Sources.orders(spark, Sf001)
          .filter("o_orderpriority = '1-URGENT'"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(expr(graft.core.Frag.sumMoney(
        graft.core.Frag.money("l_extendedprice"))).as("receita"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag").collect().toSeq
    assert(got === want)
  }

  test("probe admits every true key and prunes most of the rest") {
    BloomPrune.bloomPrune(spark, Sf001) // registers views + functions
    val total = spark.table(factView).count()
    val exact = spark.sql(probeCountSql(
      s"JOIN $dimView o ON l.l_orderkey = o.o_orderkey"))
      .head.getLong(0)
    val passed = spark.sql(probeCountSql(
      s"""WHERE graft_might_contain(
         |  (SELECT graft_bloom_agg(xxhash64(o_orderkey), 100000L, 800000L)
         |   FROM $dimView), xxhash64(l.l_orderkey))""".stripMargin))
      .head.getLong(0)
    assert(passed >= exact, "bloom must never drop a true key")
    assert(passed < total / 2,
      s"bloom should prune the non-urgent majority: $passed of $total")
  }

  test("the probe filter is pushed below the join, onto the fact side") {
    val opt = BloomPrune.bloomPrune(spark, Sf001)
      .queryExecution.optimizedPlan
    val probeFilters = opt.collect {
      case f: Filter if f.condition.toString.contains("might_contain") => f
    }
    assert(probeFilters.nonEmpty, s"no might_contain filter in:\n$opt")
    probeFilters.foreach { f =>
      assert(f.collect { case j: Join => j }.isEmpty,
        s"probe filter must sit below the join:\n$opt")
    }
  }
}

package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

import graft.ops.QualityChecks

/** The expectation suite must (a) pass wholesale on the clean corpus,
  * (b) count each injected defect exactly once under its own constraint,
  * and (c) keep the scan-side metrics in ONE aggregation over ONE scan. */
class QualityChecksSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  import spark.implicits._

  private def liRow(ok: Long, ln: Int, qty: java.lang.Double, price: Double,
      flag: String, supp: Long) =
    (ok, ln, qty, price, flag, supp)

  private def toLi(rows: Seq[(Long, Int, java.lang.Double, Double, String, Long)]) =
    rows.toDF("l_orderkey", "l_linenumber", "l_quantity",
      "l_extendedprice", "l_returnflag", "l_suppkey")

  private val supp = Seq(1L, 2L, 3L).toDF("s_suppkey")

  test("corpus report: pk_unique catches the generator's real defect") {
    // The synthetic lineitem does NOT enforce the TPC-H primary key
    // (1401 duplicate (orderkey, linenumber) pairs at sf0.001 — verified
    // independently in DuckDB); a data-quality suite that reported all
    // green here would be the broken one.  Every other constraint holds.
    val out = QualityChecks.expectations(spark, Sf001).collect()
    assert(out.length === 7)
    val byName = out.map(r =>
      r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(byName("pk_unique") === ((1401L, false)))
    (byName - "pk_unique").foreach { case (n, (v, ok)) =>
      assert(ok && v === 0L, s"$n: $v") }
  }

  test("each injected defect is counted by exactly its own constraint") {
    val rows = Seq(
      liRow(1, 1, 5.0, 10.0, "A", 1), // clean
      liRow(1, 2, null, 10.0, "N", 1), // null quantity
      liRow(2, 1, 99.0, 10.0, "R", 2), // out of range
      liRow(3, 1, 5.0, 10.0, "X", 2), // bad flag
      liRow(4, 1, 5.0, -1.0, "A", 3), // non-positive price
      liRow(5, 1, 5.0, 10.0, "A", 7), // orphan suppkey
      liRow(6, 1, 5.0, 10.0, "A", 1), // pk dup pair ↓
      liRow(6, 1, 6.0, 11.0, "A", 1))
    val got = QualityChecks.expectationsOf(toLi(rows), supp)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("completeness_quantity") === 1L)
    assert(got("pk_unique") === 1L)
    assert(got("quantity_in_range") === 1L) // NULL comparison ≠ violation
    assert(got("returnflag_domain") === 1L)
    assert(got("price_positive") === 1L)
    assert(got("supplier_ref") === 1L)
    assert(got("linenumber_digit") === 0L)
  }

  test("scan metrics run as one aggregation; the ref check broadcasts") {
    val plan = QualityChecks.expectations(spark, Sf001)
      .queryExecution.executedPlan
    val scans = collectWithSubqueries(plan) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    // lineitem twice (metrics + ref probe) and supplier once; the
    // COUNT(DISTINCT) expand keeps the metric leg a single scan.
    assert(scans.count(_.tableIdentifier.isEmpty) <= 3, scans.length)
    val bcast = collectWithSubqueries(plan) {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }
    assert(bcast.nonEmpty, "supplier ref-check must broadcast the dim")
  }
}

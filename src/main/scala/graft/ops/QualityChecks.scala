package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Sources

/** Data-quality expectation suite — the Deequ/Great-Expectations shape a
  * production ingest runs before publishing a partition: declare
  * constraints, compute ALL their metrics in one pass, emit one row per
  * constraint with its violation count and pass/fail verdict.
  *
  * The reference validates loads implicitly (row counts after each load,
  * e.g. kpi_receita_farmer_m_passado/load.py:78-83); a 100 TB pipeline
  * needs the checks to be declarative and single-scan.
  *
  * Scale design: all six scan constraints compute over ONE scan of the
  * fact table — Catalyst's distinct-aggregate rewrite groups the scan by
  * the folded PK while carrying the other metrics' partials (audit:
  * scan → partial agg → one exchange keyed on the fold → final), so the
  * exchange carries one row per DISTINCT KEY — the inherent price of
  * exact uniqueness; at 100 TB swap the uniqueness metric to the HLL
  * sketch regime if approximate suffices.  The referential check is a
  * LEFT ANTI join against the
  * supplier dimension — broadcast here; at a dimension too big to
  * broadcast it becomes a shuffle semi-join, optionally bloom-prescreened
  * ([[BloomPrune]]).  Both 1-row legs meet in a trivial 1×1 cross join and
  * unpivot to the per-constraint report: nothing row-sized ever moves.
  *
  * The primary-key uniqueness metric folds the composite key into ONE
  * injective BIGINT (`l_orderkey * 10 + l_linenumber`, linenumber < 10 by
  * TPC-H construction — asserted) so the distinct-count fragment is
  * shared verbatim with the oracle (multi-column COUNT(DISTINCT a, b)
  * parses differently across engines; the fold parses identically).
  *
  * On the driver's synthetic corpus the pk_unique constraint genuinely
  * FAILS (the generator does not enforce the TPC-H primary key — 14168
  * duplicate pairs at sf0.01, independently confirmed in DuckDB): the
  * registered output carries the violation count and `passed = false`,
  * and the gate hash-checks that BOTH engines count the same defect —
  * a quality suite is graded on what it catches, not on reporting green.
  */
object QualityChecks {

  /** (name, violation-count SQL) — shared verbatim with the oracle.
    * COUNT(*) FILTER returns BIGINT in both engines (SUM(CASE..) would be
    * HUGEINT in DuckDB and hash-mismatch). */
  private val scanChecks: Seq[(String, String)] = Seq(
    "completeness_quantity" ->
      "COUNT(*) FILTER (WHERE l_quantity IS NULL)",
    "pk_unique" ->
      "COUNT(*) - COUNT(DISTINCT l_orderkey * 10 + l_linenumber)",
    "quantity_in_range" ->
      "COUNT(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50)",
    "returnflag_domain" ->
      "COUNT(*) FILTER (WHERE l_returnflag NOT IN ('A', 'N', 'R'))",
    "price_positive" ->
      "COUNT(*) FILTER (WHERE l_extendedprice <= 0)",
    "linenumber_digit" -> // guards the pk fold's injectivity assumption
      "COUNT(*) FILTER (WHERE l_linenumber < 1 OR l_linenumber > 9)")

  def expectations(spark: SparkSession, dir: String): DataFrame =
    expectationsOf(Sources.lineitem(spark, dir),
      Sources.supplier(spark, dir))

  /** Core over explicit frames — spec-testable on corrupted inputs. */
  private[graft] def expectationsOf(li: DataFrame,
      supplier: DataFrame): DataFrame = {
    // OPTIMIZATION r14 (guide §2.4): the scan checks and the referential
    // check ran as two separate fact passes (an aggregate + an anti-join
    // aggregate).  The anti-join count is equivalently a conditional
    // count over a broadcast LEFT join (supplier key is unique, so the
    // join never fans out; an unmatched — or NULL — l_suppkey surfaces
    // as s_suppkey IS NULL exactly where the anti-join kept the row), so
    // ONE fact pass now computes every violation count.  Output
    // identical (oracle hash gate; QualitySpec).
    val joined = li.join(broadcast(supplier.select(col("s_suppkey"))),
      col("l_suppkey") === col("s_suppkey"), "left")
    val scanRow = joined.agg(
      expr(scanChecks.head._2).as(scanChecks.head._1),
      (scanChecks.tail.map { case (n, e) => expr(e).as(n) } :+
        count(when(col("s_suppkey").isNull, 1)).as("supplier_ref")): _*)
    val names = scanChecks.map(_._1) :+ "supplier_ref"
    val stackArgs = names.map(n => s"'$n', $n").mkString(", ")
    scanRow
      .selectExpr(
        s"stack(${names.size}, $stackArgs) AS (check_name, violations)")
      .withColumn("passed", col("violations") === 0L)
  }

  val expectationsOracle: String = {
    val scanSelects = scanChecks.map { case (n, e) =>
      s"SELECT '$n' AS check_name, ($e) AS violations FROM lineitem" }
    val refSelect =
      """SELECT 'supplier_ref' AS check_name, COUNT(*) AS violations
        |FROM lineitem l
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)""".stripMargin
    s"""SELECT check_name, violations, violations = 0 AS passed
       |FROM (
       |${(scanSelects :+ refSelect).mkString("\nUNION ALL\n")}
       |) t""".stripMargin
  }
}

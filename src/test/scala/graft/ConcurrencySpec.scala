package graft

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.ops.Concurrency

/** Sweep-line concurrency: hand-built overlap layouts, the
  * deltas-telescope-to-zero invariant, and a brute-force day-by-day
  * recount of the real corpus. */
class ConcurrencySpec extends SparkSpec {

  import spark.implicits._

  private def peaks(spans: Seq[(String, String)]): Map[Date, Long] =
    Concurrency.peaksOf(
      spans.map { case (s, e) => (Date.valueOf(s), Date.valueOf(e)) }
        .toDF("s", "e"))
      .collect()
      .map(r => r.getDate(0) -> r.getLong(1))
      .toMap

  test("nested, chained, and disjoint intervals peak where they overlap") {
    // [01-01, 01-03] ∋ [01-02, 01-02]; [01-05, 01-06] disjoint.
    val out = peaks(Seq(
      ("2024-01-01", "2024-01-03"),
      ("2024-01-02", "2024-01-02"),
      ("2024-01-05", "2024-01-06")))
    assert(out(Date.valueOf("2024-01-01")) === 2L)
  }

  test("end day is inclusive: back-to-back intervals do not overlap") {
    // First ends on 01-02, second starts 01-03: concurrency never
    // exceeds 1; but starting ON the end day does overlap.
    assert(peaks(Seq(("2024-01-01", "2024-01-02"),
      ("2024-01-03", "2024-01-04")))(Date.valueOf("2024-01-01")) === 1L)
    assert(peaks(Seq(("2024-01-01", "2024-01-02"),
      ("2024-01-02", "2024-01-04")))(Date.valueOf("2024-01-01")) === 2L)
  }

  test("identical intervals stack") {
    val out = peaks(Seq.fill(5)(("2024-03-10", "2024-03-12")))
    assert(out(Date.valueOf("2024-03-01")) === 5L)
  }

  test("a month containing only the closing delta reports zero peak") {
    // Interval ends on the last day of January: the −1 delta lands on
    // 02-01, so February's only observed concurrency level is 0.
    val out = peaks(Seq(("2024-01-30", "2024-01-31")))
    assert(out(Date.valueOf("2024-02-01")) === 0L)
  }

  test("levels stay within [0, #intervals] on the real corpus") {
    val spans = graft.core.Sources.lineitem(spark, Sf001)
      .groupBy(col("l_orderkey"))
      .agg(to_date(min(col("l_shipdate"))).as("s"),
        to_date(max(col("l_shipdate"))).as("e"))
    val n = spans.count()
    val out = Concurrency.peaksOf(spans).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(1) >= 0L && r.getLong(1) <= n))
  }

  test("real corpus: peaks match a brute-force day-by-day recount") {
    val spans = graft.core.Sources.lineitem(spark, Sf001)
      .groupBy(col("l_orderkey"))
      .agg(to_date(min(col("l_shipdate"))).as("s"),
        to_date(max(col("l_shipdate"))).as("e"))
      .collect()
      .map(r => (r.getDate(1).toLocalDate, r.getDate(2).toLocalDate))
    // Observed delta days — the days the operator evaluates levels on.
    val days = (spans.map(_._1) ++ spans.map(_._2.plusDays(1))).distinct
    val expected = days.map { d =>
      d -> spans.count { case (s, e) => !d.isBefore(s) && !d.isAfter(e) }
    }
      .groupBy { case (d, _) => d.withDayOfMonth(1) }
      .map { case (m, xs) => m -> xs.map(_._2).max.toLong }
    val got = Concurrency.peaksOf(
      spans.map { case (s, e) => (Date.valueOf(s), Date.valueOf(e)) }
        .toSeq.toDF("s", "e"))
      .collect()
      .map(r => r.getDate(0).toLocalDate -> r.getLong(1))
      .toMap
    assert(got === expected)
  }
}

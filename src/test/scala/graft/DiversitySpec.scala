package graft

import java.sql.Date

import graft.ops.Diversity

/** Gini–Simpson / inverse-Simpson daily mix diversity on hand-computed
  * fixtures: the uniform mix maxes out, the single-type day bottoms at
  * zero, and the counts are exact. */
class DiversitySpec extends SparkSpec {
  import spark.implicits._

  test("diversity indices match hand computation across mix shapes") {
    val cells = Seq(
      (Date.valueOf("2024-01-01"), "A", 3L),
      (Date.valueOf("2024-01-01"), "B", 1L),
      (Date.valueOf("2024-01-02"), "A", 2L),
      (Date.valueOf("2024-01-03"), "A", 1L),
      (Date.valueOf("2024-01-03"), "B", 1L),
      (Date.valueOf("2024-01-03"), "C", 1L),
      (Date.valueOf("2024-01-03"), "D", 1L)
    ).toDF("day", "event_type", "c")
    val got = Diversity.simpsonDailyOf(cells)
      .as[(Date, Long, Long, BigDecimal, BigDecimal)].collect().toSeq
    assert(got.map(r => (r._1.toString, r._2, r._3)) == Seq(
      ("2024-01-01", 4L, 2L), ("2024-01-02", 2L, 1L),
      ("2024-01-03", 4L, 4L)))
    // day1: 1 − (9+1)/16 = 0.375, inverse 16/10 = 1.6
    assert(got(0)._4 == BigDecimal("0.375000"))
    assert(got(0)._5 == BigDecimal("1.600000"))
    // single-type day: zero diversity, effective types = 1
    assert(got(1)._4 == BigDecimal("0.000000"))
    assert(got(1)._5 == BigDecimal("1.000000"))
    // uniform 4-type day: 1 − 4/16 = 0.75, effective types = 4
    assert(got(2)._4 == BigDecimal("0.750000"))
    assert(got(2)._5 == BigDecimal("4.000000"))
  }
}

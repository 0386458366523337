package graft

import java.sql.Date

import graft.ops.Changepoint

/** CUSUM changepoint: hand-computed level shift, the earliest-day
  * tie-break, and shape/determinism on the real event log. */
class ChangepointSpec extends SparkSpec {

  import spark.implicits._

  private def cp(rows: Seq[(String, String, Long)])
      : Map[String, (Long, Date, Long)] =
    Changepoint.cusumOf(
      rows.map { case (t, d, c) => (t, Date.valueOf(d), c) }
        .toDF("event_type", "day", "cents"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDate(2), r.getLong(3)))
      .toMap

  test("a clean level shift peaks |S*| on the last low day") {
    // x = [0,0,0,100,100,100]: S*_t = n·P_t − t·T peaks (in absolute
    // value) at t = 3, the boundary of the shift: S* = [−300, −600,
    // −900, −600, −300, 0].
    val days = (1 to 6).map(i => f"2024-01-0$i")
    val cents = Seq(0L, 0L, 0L, 100L, 100L, 100L)
    val out = cp(days.zip(cents).map { case (d, c) => ("a", d, c) })
    assert(out("a") === ((6L, Date.valueOf("2024-01-03"), 900L)))
  }

  test("tied |S*|: the earliest day wins") {
    // x = [0,100,0,100]: S* = [−200, 0, −200, 0] — days 1 and 3 tie.
    val days = (1 to 4).map(i => f"2024-01-0$i")
    val cents = Seq(0L, 100L, 0L, 100L)
    val out = cp(days.zip(cents).map { case (d, c) => ("a", d, c) })
    assert(out("a") === ((4L, Date.valueOf("2024-01-01"), 200L)))
  }

  test("constant series: |S*| is identically zero, day 1 reported") {
    val days = (1 to 3).map(i => f"2024-01-0$i")
    val out = cp(days.map(d => ("a", d, 50L)))
    assert(out("a") === ((3L, Date.valueOf("2024-01-01"), 0L)))
  }

  test("types are independent series") {
    val out = cp(Seq(
      ("a", "2024-01-01", 0L), ("a", "2024-01-02", 100L),
      ("b", "2024-01-01", 7L)))
    assert(out("a") === ((2L, Date.valueOf("2024-01-01"), 100L)))
    assert(out("b") === ((1L, Date.valueOf("2024-01-01"), 0L)))
  }

  test("real log: one row per event type, deterministic") {
    val rows = Changepoint.cusum(spark, Sf001).collect()
    val types = graft.core.Sources.events(spark, Sf001)
      .select("event_type").distinct().count()
    assert(rows.length === types)
    assert(rows.forall(_.getLong(3) >= 0L))
    val again = Changepoint.cusum(spark, Sf001).collect()
    assert(rows.map(_.toString).sorted.toSeq ===
      again.map(_.toString).sorted.toSeq)
  }
}

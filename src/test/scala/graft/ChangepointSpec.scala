package graft

import java.sql.Date

import org.apache.spark.sql.functions._

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

  private def anomalies(rows: Seq[(String, String, Long)])
      : Map[(String, Date), (Long, Boolean)] =
    Changepoint.anomalyDaysOf(
      rows.map { case (t, d, c) => (t, Date.valueOf(d), c) }
        .toDF("event_type", "day", "t"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1)) ->
        (r.getLong(2), r.getBoolean(3)))
      .toMap

  test("anomaly: a spike after a flat week is flagged; a repeat is not") {
    val flat = (1 to 7).map(i => ("a", f"2024-01-0$i", 100L))
    val out = anomalies(flat ++ Seq(
      ("a", "2024-01-08", 200L), ("a", "2024-01-09", 100L)))
    // Day 8: window variance 0, t deviates → (7·200−700)² > 0 flags.
    assert(out(("a", Date.valueOf("2024-01-08"))) === ((200L, true)))
    // Day 9: its window now holds the spike; z² = (7·100−800)²=10000… vs
    // 9·(7·50000−640000): driver-recomputed below rather than hand-waved.
    val w = Seq(100L, 100L, 100L, 100L, 100L, 100L, 200L)
    val (s1, s2) = (w.sum, w.map(x => x * x).sum)
    val lhs = (7 * 100L - s1) * (7 * 100L - s1)
    val rhs = 9 * (7 * s2 - s1 * s1)
    assert(out(("a", Date.valueOf("2024-01-09")))._2 === (lhs > rhs))
  }

  test("anomaly: first 7 observed days per type are unscored") {
    val out = anomalies((1 to 9).map(i => ("a", f"2024-01-0$i", 100L)) ++
      (1 to 3).map(i => ("b", f"2024-01-0$i", 50L)))
    assert(out.keys.map(_._1).toSet === Set("a"))
    assert(out.size === 2)
    assert(out.values.forall(!_._2)) // constant series: never anomalous
  }

  test("anomaly flags match an exact-integer driver recount on real data") {
    val daily = graft.core.Sources.events(spark, Sf001)
      .groupBy(col("event_type"),
        to_date(col("ts")).as("day"))
      .agg(expr("CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)")
        .as("t"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val expected = daily.groupBy(_._1).flatMap { case (et, rows) =>
      val sorted = rows.sortBy(_._2.toEpochDay).map(r => (r._2, r._3))
      sorted.indices.drop(7).map { i =>
        val w = sorted.slice(i - 7, i).map(_._2)
        val (s1, s2) = (w.sum, w.map(x => x * x).sum)
        val t = sorted(i)._2
        (et, sorted(i)._1) ->
          ((7 * t - s1) * (7 * t - s1) > 9 * (7 * s2 - s1 * s1))
      }
    }
    val got = Changepoint.anomalyDays(spark, Sf001).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate) -> r.getBoolean(3))
      .toMap
    assert(got === expected.toMap)
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

  private def runs(rows: Seq[(String, String, Long)]) =
    Changepoint.runsTestOf(
      rows.map { case (t, d, c) => (t, Date.valueOf(d), c) }
        .toDF("event_type", "day", "cents"))
      .collect().map(r => r.getString(0) -> r).toMap

  test("runs test: alternating series maximizes runs, monotone minimizes") {
    val days = (1 to 7).map(i => f"2024-01-0$i")
    // alt: 0,10,0,10,0,10,0 → deltas +,-,+,-,+,- : 6 runs of length 1.
    // mono: strictly increasing → 6 up deltas, 1 run.
    val rows = days.zipWithIndex.flatMap { case (d, i) =>
      Seq(("alt", d, if (i % 2 == 0) 0L else 10L),
        ("mono", d, i * 10L))
    }
    val got = runs(rows)
    val alt = got("alt")
    assert(alt.getLong(alt.fieldIndex("n_up")) === 3L)
    assert(alt.getLong(alt.fieldIndex("n_down")) === 3L)
    assert(alt.getLong(alt.fieldIndex("n_runs")) === 6L)
    // E[R] = 1 + 2·3·3/6 = 4; oscillation ⇒ z > 0.
    assert(alt.getDouble(alt.fieldIndex("e_runs")) === 4.0)
    assert(alt.getDouble(alt.fieldIndex("z")) > 0.0)
    val mono = got("mono")
    assert(mono.getLong(mono.fieldIndex("n_up")) === 6L)
    assert(mono.getLong(mono.fieldIndex("n_down")) === 0L)
    assert(mono.getLong(mono.fieldIndex("n_runs")) === 1L)
    // One-sided series: variance degenerates → NULL, not a throw.
    assert(mono.isNullAt(mono.fieldIndex("z")))
  }

  test("runs test: zero deltas drop; ties and singles stay NULL-sane") {
    val got = runs(Seq(
      ("flat", "2024-01-01", 5L), ("flat", "2024-01-02", 5L),
      ("flat", "2024-01-03", 5L),
      ("one", "2024-01-01", 1L), ("one", "2024-01-02", 2L)))
    // A constant series has no nonzero delta → no row at all.
    assert(!got.contains("flat"))
    val one = got("one")
    assert(one.getLong(one.fieldIndex("n_runs")) === 1L)
    assert(one.isNullAt(one.fieldIndex("z")))
  }
}

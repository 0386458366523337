package graft

import graft.ops.TimeToConvert

/** Time-to-convert: hand-computed latencies, the pre-signup-purchase
  * exclusion, and recomputation of every cell on the real log. */
class TimeToConvertSpec extends SparkSpec {

  import spark.implicits._

  private def run(rows: Seq[(Long, Long, String)], cap: Int = 32768) = {
    graft.functions.QuantileSketch.register(spark)
    TimeToConvert.timeToConvertOf(
      rows.toDF("user_id", "sec", "event_type"), cap).collect().head
  }

  test("hand histories: first post-signup purchase sets the delta") {
    // u1: signup@10, purchases@5 (before, ignored) and @40 → delta 30.
    // u2: signup@100, purchase@110 → delta 10.
    // u3: signup@7, no purchase → signed up, not converted.
    // u4: purchase only → not a signup, excluded entirely.
    val r = run(Seq(
      (1L, 5L, "purchase"), (1L, 10L, "signup"), (1L, 40L, "purchase"),
      (2L, 100L, "signup"), (2L, 110L, "purchase"),
      (3L, 7L, "signup"),
      (4L, 1L, "purchase")))
    assert(r.getLong(0) === 3L) // n_signups
    assert(r.getLong(1) === 2L) // n_converted
    assert(r.getDouble(2) === 0.666667)
    // deltas {10, 30}: p50 = rank ceil(0.5·2)=1 → 10; p90 = rank 2 → 30.
    assert(r.getLong(3) === 10L)
    assert(r.getLong(4) === 30L)
  }

  test("nobody converts: quantiles are NULL, rate is zero") {
    val r = run(Seq((1L, 10L, "signup"), (2L, 20L, "signup")))
    assert(r.getLong(0) === 2L)
    assert(r.getLong(1) === 0L)
    assert(r.getDouble(2) === 0.0)
    assert(r.isNullAt(3) && r.isNullAt(4))
  }

  test("same-second signup and purchase converts with delta zero") {
    val r = run(Seq((1L, 10L, "signup"), (1L, 10L, "purchase")))
    assert(r.getLong(1) === 1L)
    assert(r.getLong(3) === 0L)
  }

  test("real log: cells recompute from a driver-side brute force") {
    val out = TimeToConvert.timeToConvert(spark, Sf001).collect().head
    val ev = graft.core.Sources.events(spark, Sf001)
      .selectExpr("user_id", "CAST(ts AS LONG) AS sec", "event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byUser = ev.groupBy(_._1)
    val signups = byUser.flatMap { case (_, rows) =>
      val s = rows.filter(_._3 == "signup").map(_._2)
      if (s.isEmpty) None else Some(s.min -> rows)
    }.toSeq
    val deltas = signups.flatMap { case (s, rows) =>
      val ds = rows.filter(r => r._3 == "purchase" && r._2 >= s)
        .map(_._2 - s)
      if (ds.isEmpty) None else Some(ds.min)
    }.sorted
    assert(out.getLong(0) === signups.size.toLong)
    assert(out.getLong(1) === deltas.size.toLong)
    def rank(p: Double) = deltas(math.ceil(p * deltas.size).toInt - 1)
    assert(out.getLong(3) === rank(0.5))
    assert(out.getLong(4) === rank(0.9))
  }
}

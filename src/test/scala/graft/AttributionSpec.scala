package graft

import org.apache.spark.sql.functions._

import graft.ops.Attribution

/** First-touch attribution: hand-checked credit assignment, the
  * partition property (channel totals tile overall purchase revenue),
  * and the (sec, event_id) tie-break that keeps ordering cross-engine
  * deterministic. */
class AttributionSpec extends SparkSpec {

  import spark.implicits._

  private def ev(rows: (Long, Long, Long, String, String)*) =
    rows.toSeq
      .map { case (u, sec, id, t, cents) => (u, sec, id, t, BigDecimal(cents)) }
      .toDF("user_id", "sec", "event_id", "event_type", "cents")
      .withColumn("cents", col("cents").cast("decimal(18,2)"))

  private def evL(rows: (Long, Long, Long, String, Long)*) =
    rows.toSeq.toDF("user_id", "sec", "event_id", "event_type", "cents")

  test("linear touch: equal split with largest-remainder cents") {
    // user 1 views A and clicks B, then buys 101 over {click, view}:
    // base 50, remainder 1 → the alphabetically-first channel (click)
    // gets the extra cent.  user 2 buys 100 over {click, signup, view}:
    // base 33, remainder 1 → click 34.
    val out = Attribution.linearTouchOf(evL(
      (1L, 100L, 1L, "view", 0L),
      (1L, 200L, 2L, "click", 0L),
      (1L, 300L, 3L, "purchase", 101L),
      (2L, 10L, 4L, "signup", 0L),
      (2L, 20L, 5L, "view", 0L),
      (2L, 30L, 6L, "click", 0L),
      (2L, 40L, 7L, "purchase", 100L)))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("click") === ((2L, 51L + 34L)))
    assert(out("view") === ((2L, 50L + 33L)))
    assert(out("signup") === ((1L, 33L)))
    assert(out.size === 3)
  }

  test("linear touch: no prior touches → 'direct' takes it all") {
    val out = Attribution.linearTouchOf(evL(
      (1L, 100L, 1L, "purchase", 77L),
      (1L, 200L, 2L, "view", 0L),
      (1L, 300L, 3L, "purchase", 23L)))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // First purchase has no history → direct; second sees only 'view'.
    assert(out("direct") === ((1L, 77L)))
    assert(out("view") === ((1L, 23L)))
  }

  test("linear touch: prior purchases are not channels") {
    val out = Attribution.linearTouchOf(evL(
      (1L, 100L, 1L, "view", 0L),
      (1L, 200L, 2L, "purchase", 10L),
      (1L, 300L, 3L, "purchase", 10L)))
      .collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out === Map("view" -> 20L))
  }

  test("linear touch: credits tile total purchase revenue exactly") {
    val ev = graft.core.Sources.events(spark, Sf001)
      .select(col("user_id"), col("ts").cast("bigint").as("sec"),
        col("event_id"), col("event_type"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("cents"))
    val total = ev.filter(col("event_type") === "purchase")
      .agg(sum(col("cents"))).collect()(0).getLong(0)
    val credited = Attribution.linearTouchOf(ev)
      .agg(sum(col("credited_cents"))).collect()(0).getLong(0)
    assert(credited === total)
  }

  test("credit goes to the first event's channel, hand-checked") {
    // user 1: view first, buys 10 + 20; user 2: signup first, buys 5;
    // user 3: click first, never buys.
    val out = Attribution.firstTouchOf(ev(
      (1L, 100L, 1L, "view", "0"),
      (1L, 200L, 2L, "purchase", "10"),
      (1L, 300L, 3L, "purchase", "20"),
      (2L, 50L, 4L, "signup", "0"),
      (2L, 60L, 5L, "purchase", "5"),
      (3L, 10L, 6L, "click", "0")))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDecimal(3).doubleValue)))
      .toMap
    assert(out("view") === ((1L, 2L, 30.0)))
    assert(out("signup") === ((1L, 1L, 5.0)))
    assert(out("click") === ((1L, 0L, 0.0)))
    assert(out.size === 3)
  }

  test("ties on the second break on event_id") {
    val out = Attribution.firstTouchOf(ev(
      (1L, 100L, 7L, "click", "0"), // same second, higher id
      (1L, 100L, 6L, "view", "0"),
      (1L, 200L, 8L, "purchase", "42")))
      .collect()
    assert(out.length === 1)
    assert(out.head.getString(0) === "view")
  }

  test("channel totals partition overall purchase revenue on the corpus") {
    val events = graft.core.Sources.events(spark, Sf001)
    val out = Attribution.firstTouch(spark, Sf001)
    val creditTotal = out.agg(sum("attributed")).head.getDecimal(0)
    val purchaseTotal = events
      .filter(col("event_type") === "purchase")
      .agg(expr(graft.core.Frag.sumMoney(graft.core.Frag.money("value"))))
      .head.getDecimal(0)
    assert(creditTotal.compareTo(purchaseTotal) === 0)
    val users = out.agg(sum("users")).head.getLong(0)
    assert(users === events.select("user_id").distinct.count())
  }
}

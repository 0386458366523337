package graft

import graft.ops.Markov

/** Markov transitions: hand-checked pairs and probabilities, the
  * (sec, event_id) tie-break, and row-stochasticity on the real log. */
class MarkovSpec extends SparkSpec {

  import spark.implicits._

  private def trans(rows: Seq[(Long, Long, Long, String)])
      : Map[(String, String), (Long, Double)] =
    Markov.transitionsOf(
      rows.toDF("user_id", "sec", "event_id", "event_type"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3)))
      .toMap

  test("hand history: counts and row-normalized probabilities") {
    // User 1: view → click → purchase; user 2: view → view.
    val t = trans(Seq(
      (1L, 10L, 1L, "view"), (1L, 20L, 2L, "click"),
      (1L, 30L, 3L, "purchase"),
      (2L, 40L, 4L, "view"), (2L, 50L, 5L, "view")))
    assert(t === Map(
      ("view", "click") -> (1L, 0.5),
      ("view", "view") -> (1L, 0.5),
      ("click", "purchase") -> (1L, 1.0)))
  }

  test("equal seconds: event_id breaks the tie deterministically") {
    // Both events of user 1 land in the same second; id order must
    // decide, so a→b is the only transition (never b→a).
    val t = trans(Seq(
      (1L, 10L, 1L, "a"), (1L, 10L, 2L, "b")))
    assert(t === Map(("a", "b") -> (1L, 1.0)))
  }

  test("last event of each user emits no transition") {
    val t = trans(Seq((1L, 10L, 1L, "solo")))
    assert(t.isEmpty)
  }

  test("real log: rows are a stochastic matrix over the observed types") {
    val rows = Markov.transitions(spark, Sf001).collect()
    assert(rows.nonEmpty)
    val types = rows.map(_.getString(0)).toSet ++
      rows.map(_.getString(1)).toSet
    assert(rows.length <= types.size * types.size)
    // Each from-row's probabilities sum to 1 up to the 6dp rounding.
    rows.groupBy(_.getString(0)).foreach { case (from, rs) =>
      val s = rs.map(_.getDouble(3)).sum
      assert(math.abs(s - 1.0) < 1e-4, s"row $from sums to $s")
    }
    // Counts are conserved: Σ n = #events − #users-with-events.
    val ev = graft.core.Sources.events(spark, Sf001)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(rows.map(_.getLong(2)).sum === expected)
  }

  // ------------------------------------------------------------------
  // Top entry paths
  // ------------------------------------------------------------------

  private def paths(rows: Seq[(Long, Long, Long, String)], k: Int = 3)
      : Map[String, Long] =
    Markov.topPathsOf(
      rows.toDF("user_id", "sec", "event_id", "event_type"), k)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("paths: first k events in time order, short histories kept whole") {
    val out = paths(Seq(
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"),
      (1L, 30L, 3L, "c"), (1L, 40L, 4L, "d"), // truncated at k = 3
      (2L, 50L, 5L, "a"), (2L, 60L, 6L, "b"),
      (3L, 70L, 7L, "a"), (3L, 80L, 8L, "b")))
    assert(out === Map("a>b>c" -> 1L, "a>b" -> 2L))
  }

  test("paths: equal seconds fall back to event_id order") {
    val out = paths(Seq(
      (1L, 10L, 2L, "b"), (1L, 10L, 1L, "a")))
    assert(out === Map("a>b" -> 1L))
  }

  test("real log: path users partition the user base") {
    val out = Markov.topPaths(spark, Sf001).collect()
    val users = graft.core.Sources.events(spark, Sf001)
      .select("user_id").distinct().count()
    assert(out.map(_.getLong(1)).sum === users)
    assert(out.forall(_.getString(0).split(">").length <= 3))
  }
}

package graft

import java.sql.Timestamp

import graft.ops.AsOfEvent

/** The union+window as-of join vs a brute-force per-purchase maximum —
  * the driver gate already cross-checks it against DuckDB's native ASOF
  * JOIN; this pins the semantics against a third, direct formulation so a
  * same-wrong-answer coincidence can't hide behind either. */
class AsOfEventSpec extends SparkSpec {

  private val tolMin = 30

  private lazy val raw: Seq[(Long, Long, Timestamp, String)] =
    graft.core.Sources.events(spark, Sf001)
      .filter("event_type IN ('view', 'purchase')")
      .selectExpr("event_id", "user_id", "ts", "event_type")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getString(3)))

  test("as-of equals the brute-force latest-view-within-tolerance") {
    val viewsByUser = raw.filter(_._4 == "view")
      .groupBy(_._2).map { case (u, vs) => u -> vs.map(_._3.getTime) }
    val want = raw.filter(_._4 == "purchase").map { case (id, u, ts, _) =>
      val cands = viewsByUser.getOrElse(u, Seq.empty)
        .filter(v => v <= ts.getTime && v >= ts.getTime - tolMin * 60000L)
      id -> (if (cands.isEmpty) None else Some(cands.max))
    }.toMap

    val got = AsOfEvent.asOf(spark, Sf001, tolMin).collect()
      .map { r =>
        val v = r.getAs[Timestamp]("asof_view_ts")
        r.getAs[Long]("purchase_event_id") ->
          (if (v == null) None else Some(v.getTime))
      }.toMap

    assert(got.size === want.size)
    assert(got === want)
    // Sanity on the corpus itself: the suite must exercise BOTH branches.
    assert(got.values.exists(_.isDefined) && got.values.exists(_.isEmpty))
  }

  test("lag_seconds is the whole-second epoch difference, NULL iff no match") {
    AsOfEvent.asOf(spark, Sf001, tolMin).collect().foreach { r =>
      val v = r.getAs[Timestamp]("asof_view_ts")
      if (v == null) assert(r.isNullAt(r.fieldIndex("lag_seconds")))
      else {
        val p = r.getAs[Timestamp]("purchase_ts")
        val lag = r.getAs[Long]("lag_seconds")
        assert(lag === p.getTime / 1000L - v.getTime / 1000L)
        assert(lag >= 0L && lag <= tolMin * 60L)
      }
    }
  }

  test("the plan is one user_id exchange and no join") {
    val plan = AsOfEvent.asOf(spark, Sf001, tolMin)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    assert("hashpartitioning\\(user_id".r.findAllIn(plan).size >= 1)
  }
}

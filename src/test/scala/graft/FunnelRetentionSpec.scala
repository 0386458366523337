package graft

import org.apache.spark.sql.Row

import graft.ops.AnalyticsQueries

/** The funnel/retention/cube/window-rank analytics family: the driver gate
  * proves cross-engine hash equality vs DuckDB; these specs prove the
  * SEMANTICS against brute-force recomputations from the raw events, so a
  * same-wrong-answer-in-both-formulations bug can't hide behind the gate.
  */
class FunnelRetentionSpec extends SparkSpec {

  private def events: Seq[(Long, String, Long)] =
    graft.core.Sources.events(spark, Sf001)
      .selectExpr("user_id", "event_type", "CAST(ts AS BIGINT)") // epoch s
      .collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

  test("funnel matches a brute-force per-user sequential walk") {
    val byUser = events.groupBy(_._1)
    var (nv, nc, np) = (0L, 0L, 0L)
    byUser.values.foreach { evs =>
      val views = evs.filter(_._2 == "view").map(_._3)
      if (views.nonEmpty) {
        nv += 1
        val tv = views.min
        val clicks = evs.filter(e => e._2 == "click" && e._3 > tv).map(_._3)
        if (clicks.nonEmpty) {
          nc += 1
          val tc = clicks.min
          if (evs.exists(e => e._2 == "purchase" && e._3 > tc)) np += 1
        }
      }
    }
    val got = AnalyticsQueries.funnel(spark, Sf001)
      .orderBy("stage_idx").collect()
    assert(got.map(_.getLong(got.head.fieldIndex("n_users"))).toSeq ===
      Seq(nv, nc, np))
    // CAST(ts AS BIGINT) is whole seconds while the funnel compares at
    // microseconds, so equality above also needs the strictly-after rule
    // to agree at both resolutions; the synthetic data's events are
    // seconds-apart, which EntrySpec's oracle run would catch drifting.
    val pcts = got.map(_.getDouble(got.head.fieldIndex("pct_of_top")))
    assert(pcts.head === 1.0)
    assert(pcts.sliding(2).forall(p => p(1) <= p(0)), "funnel must narrow")
  }

  test("retention week-0 cell equals the cohort size") {
    val rows = AnalyticsQueries.retention(spark, Sf001).collect()
    val byCohort = rows.groupBy(_.getDate(0).toString)
    val signupUsers = events.filter(_._2 == "signup").map(_._1).distinct.size
    // Every signup user is active in their signup week (the signup event
    // itself), so Σ week-0 cells over cohorts = distinct signup users.
    val week0Total = rows
      .filter(_.getInt(rows.head.fieldIndex("weeks_since")) == 0)
      .map(_.getLong(rows.head.fieldIndex("n_users"))).sum
    assert(week0Total === signupUsers)
    // A later-week cell can never exceed its cohort's week-0 cell.
    byCohort.values.foreach { cells =>
      val w0 = cells.filter(_.getInt(1) == 0).map(_.getLong(2)).sum
      cells.foreach(c => assert(c.getLong(2) <= w0))
    }
  }

  test("cohort LTV: ratio recomputes from cells and cohort sizes exactly") {
    val rows = AnalyticsQueries.cohortLtv(spark, Sf001).collect()
    assert(rows.nonEmpty)
    // Brute-force cohort sizes from raw events: signup users per week of
    // their first signup (the query's own definition, recomputed).
    // date_trunc('week') is Monday-based; epoch day 0 (1970-01-01) was a
    // Thursday, so days-since-Monday = (day + 3) mod 7.
    val cohortSizes = events.filter(_._2 == "signup")
      .groupBy(_._1).map { case (_, evs) => evs.map(_._3).min }
      .groupBy(sec => { val d = sec / 86400; d - Math.floorMod(d + 3, 7L) })
      .map { case (d, xs) => d -> xs.size }
    val byCohort = rows.groupBy(_.getDate(0).toLocalDate.toEpochDay)
    byCohort.foreach { case (cohortDay, cells) =>
      val n = cohortSizes.getOrElse(cohortDay,
        fail(s"no recomputed cohort for epoch day $cohortDay"))
      val sorted = cells.sortBy(_.getInt(1))
      var running = java.math.BigDecimal.ZERO
      sorted.foreach { c =>
        running = running.add(c.getDecimal(3))
        // ltv = cum/cohort_n as ONE double division of the exact values.
        assert(c.getDouble(4) === running.doubleValue / n.toDouble)
      }
      val ltvs = sorted.map(_.getDouble(4))
      assert(ltvs.zip(ltvs.tail).forall { case (a, b) => b >= a },
        "cumulative LTV must be monotone")
    }
  }

  test("cube emits all four grouping combinations consistently") {
    val rows = AnalyticsQueries.cube(spark, Sf001).collect()
    def key(r: Row) = (r.isNullAt(0), r.isNullAt(1))
    val combos = rows.groupBy(key)
    assert(combos.keySet ===
      Set((false, false), (false, true), (true, false), (true, true)))
    val grand = combos((true, true))
    assert(grand.size === 1)
    val nIdx = rows.head.fieldIndex("n")
    val total = grand.head.getLong(nIdx)
    // Each marginal slice must re-total to the grand count.
    assert(combos((false, true)).map(_.getLong(nIdx)).sum === total)
    assert(combos((true, false)).map(_.getLong(nIdx)).sum === total)
    assert(combos((false, false)).map(_.getLong(nIdx)).sum === total)
  }

  test("window ranks: ntile balance, percent_rank and cume_dist laws") {
    val rows = AnalyticsQueries.windowRanks(spark, Sf001).collect()
    val i = rows.head
    val (seg, qt, pr, cd) = (i.fieldIndex("c_mktsegment"),
      i.fieldIndex("quartil"), i.fieldIndex("pct_rank"),
      i.fieldIndex("cum_dist"))
    rows.groupBy(_.getString(seg)).values.foreach { part =>
      val sizes = part.groupBy(_.getInt(qt)).view.mapValues(_.size).values
      assert(sizes.max - sizes.min <= 1, "ntile quartiles balance to ±1")
      assert(part.map(_.getDouble(pr)).min === 0.0)
      assert(part.map(_.getDouble(pr)).max <= 1.0)
      assert(part.map(_.getDouble(cd)).max === 1.0)
      assert(part.map(_.getDouble(cd)).min > 0.0)
    }
  }
}

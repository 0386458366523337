package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.ops.Survival

/** Kaplan–Meier product-limit estimator: hand-computed risk sets with
  * right censoring, and the estimator's laws on the real corpus. */
class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  private def eventsDir(rows: Seq[(Long, String, Long)]): String = {
    val dir = Files.createTempDirectory("graft_surv_").toString
    rows.zipWithIndex.map { case ((uid, ts, v), i) =>
      (i.toLong, Timestamp.valueOf(ts), uid, "click", v.toDouble, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("hand-computed curve: censored users leave the risk set eventless") {
    // maxday = 2024-01-21; churn horizon = maxday − 7 (2024-01-14).
    // u1 dur 1 churned, u2 dur 2 churned, u3 dur 2 CENSORED (active
    // past the horizon), u4 dur 0 censored.
    // Grid: (0: d0 c1), (1: d1 c0), (2: d1 c1); risk sets 4, 3, 2 →
    // S(0)=1, S(1)=2/3, S(2)=2/3·1/2=1/3.
    val dir = eventsDir(Seq(
      (1L, "2024-01-01 10:00:00", 1L), (1L, "2024-01-02 10:00:00", 1L),
      (2L, "2024-01-01 10:00:00", 1L), (2L, "2024-01-03 10:00:00", 1L),
      (3L, "2024-01-15 10:00:00", 1L), (3L, "2024-01-17 10:00:00", 1L),
      (4L, "2024-01-21 10:00:00", 1L)))
    val got = Survival.kaplanMeier(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))).toMap
    assert(got(0L) == ((4L, 0L, 1L, 1.0)))
    assert(got(1L) == ((3L, 1L, 0L, math.rint(2.0 / 3 * 1e6) / 1e6)))
    assert(got(2L) == ((2L, 1L, 1L, math.rint(1.0 / 3 * 1e6) / 1e6)))
  }

  test("nelson-aalen: hand-computed hazard; additive dual of the KM grid") {
    // Same fixture as the KM hand-check: risk sets 4, 3, 2 with d =
    // 0, 1, 1 → H(0)=0, H(1)=1/3, H(2)=1/3+1/2=5/6.
    val dir = eventsDir(Seq(
      (1L, "2024-01-01 10:00:00", 1L), (1L, "2024-01-02 10:00:00", 1L),
      (2L, "2024-01-01 10:00:00", 1L), (2L, "2024-01-03 10:00:00", 1L),
      (3L, "2024-01-15 10:00:00", 1L), (3L, "2024-01-17 10:00:00", 1L),
      (4L, "2024-01-21 10:00:00", 1L)))
    val got = Survival.nelsonAalen(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))).toMap
    assert(got(0L) == ((4L, 0L, 1L, 0.0)))
    assert(got(1L) == ((3L, 1L, 0L, math.rint(1.0 / 3.0 * 1e6) / 1e6)))
    assert(got(2L) == ((2L, 1L, 1L,
      math.rint((1.0 / 3.0 + 1.0 / 2.0) * 1e6) / 1e6)))
    // Laws on the real corpus: H is non-decreasing, 0 at the first
    // event-free durations, and shares KM's grid/risk sets exactly.
    val km = graft.ops.Survival.kaplanMeier(spark, Sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val na = graft.ops.Survival.nelsonAalen(spark, Sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(na.map(t => (t._1, t._2, t._3, t._4)).sorted.toSeq ==
      km.sorted.toSeq)
    val h = na.sortBy(_._1).map(_._5)
    assert(h.zip(h.tail).forall { case (a, b) => b >= a })
  }

  test("log-rank: hand-computed two-group statistic; identical cohorts score ~0") {
    // Users 1,3 (grp 1) and 2,4 (grp 0); maxday 2024-01-21, churn
    // horizon maxday-7 = 2024-01-14 (the KM fixture's censoring).
    // u1 dur 1 churn grp1; u2 dur 2 churn grp0; u3 dur 2 censored grp1;
    // u4 dur 0 censored grp0.
    // Grid (dur: d1 dep1 d2 dep2 over grp0/grp1):
    //  dur0: departures grp0=1 (u4 censored)      n1(grp0)=2 n2(grp1)=2
    //  dur1: u1 churn (grp1)                      n1=1 n2=2 n=3 d=1
    //  dur2: u2 churn (grp0), u3 censored (grp1)  n1=1 n2=1 n=2 d=1
    // NOTE group-1 of the test = user_id%2==0 cohort ("n1" follows the
    // implementation's grp 0).  Terms:
    //  dur1: e1 = 1*1/3 = 1/3,  v = 1*(1/3)*(2/3)*(2/2) = 2/9
    //  dur2: e1 = 1*1/2 = 1/2,  v = 1*(1/2)*(1/2)*(1/1) = 1/4
    // o1 (grp0 events) = 1; e1 = 5/6; var = 17/36;
    // chi2 = (1 − 5/6)² / (17/36) = (1/36)/(17/36) = 1/17.
    val dir = eventsDir(Seq(
      (1L, "2024-01-01 10:00:00", 1L), (1L, "2024-01-02 10:00:00", 1L),
      (2L, "2024-01-01 10:00:00", 1L), (2L, "2024-01-03 10:00:00", 1L),
      (3L, "2024-01-15 10:00:00", 1L), (3L, "2024-01-17 10:00:00", 1L),
      (4L, "2024-01-21 10:00:00", 1L)))
    val r = Survival.logRank(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1)) == ((1L, 1L)))
    assert(r.getDouble(2) == math.rint(5.0 / 6.0 * 1e6) / 1e6)
    assert(r.getDouble(3) == math.rint(17.0 / 36.0 * 1e6) / 1e6)
    assert(math.abs(r.getDouble(4) - 1.0 / 17.0) < 1e-6)
    // Mirror-image cohorts (every lifetime duplicated across groups):
    // O1 == E1 exactly, statistic 0.
    val sym = eventsDir(Seq(
      (10L, "2024-01-01 10:00:00", 1L), (10L, "2024-01-03 10:00:00", 1L),
      (11L, "2024-01-01 10:00:00", 1L), (11L, "2024-01-03 10:00:00", 1L),
      (12L, "2024-01-05 10:00:00", 1L), (12L, "2024-01-06 10:00:00", 1L),
      (13L, "2024-01-05 10:00:00", 1L), (13L, "2024-01-06 10:00:00", 1L),
      (14L, "2024-01-21 10:00:00", 1L), (15L, "2024-01-21 10:00:00", 1L)))
    val s = Survival.logRank(spark, sym).collect().head
    assert(s.getLong(0) == s.getLong(1))
    assert(s.getDouble(4) == 0.0)
  }

  test("estimator laws on the real corpus: monotone, bounded, risk sets tile") {
    val rows = Survival.kaplanMeier(spark, Sf001).collect()
      .sortBy(_.getLong(0))
    assert(rows.nonEmpty)
    // S is non-increasing in duration and in (0, 1].
    val s = rows.map(_.getDouble(4))
    assert(s.zip(s.tail).forall { case (a, b) => b <= a + 1e-12 })
    assert(s.forall(x => x > 0.0 && x <= 1.0))
    // Risk sets: n(t) = n(prev) − departures(prev); first risk set is
    // the full user count.
    val n = rows.map(_.getLong(1))
    val dep = rows.map(r => r.getLong(2) + r.getLong(3))
    n.zip(dep).zip(n.tail).foreach { case ((ni, di), nNext) =>
      assert(nNext == ni - di)
    }
    assert(n.head == dep.sum)
  }
}

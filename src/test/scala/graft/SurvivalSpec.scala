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

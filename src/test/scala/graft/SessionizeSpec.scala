package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.ops.Sessionize

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def eventsDir(rows: Seq[(Long, String, Long)]): String = {
    val dir = Files.createTempDirectory("graft_sess_").toString
    rows.map { case (id, ts, uid) =>
      (id, Timestamp.valueOf(ts), uid, "view", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("gap rule: exactly gapSec stays one session, gapSec+1 splits") {
    val dir = eventsDir(Seq(
      // user 1: 0s, +1800s (same session), then +1801s (new session).
      (1L, "2024-01-01 00:00:00", 1L),
      (2L, "2024-01-01 00:30:00", 1L),
      (3L, "2024-01-01 01:00:01", 1L),
      // user 2: a single event — one session of size 1, duration 0.
      (4L, "2024-01-01 09:00:00", 2L)))
    val out = Sessionize.sessionHistogram(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // One 2-event session (user 1, duration 1800) and two 1-event
    // sessions (user 1's tail + user 2's lone event).
    assert(out(2L) == ((1L, 1L, 1800L, 1800L)))
    assert(out(1L) == ((2L, 2L, 0L, 0L)))
  }

  test("same-second ties share a session regardless of event order") {
    val dir = eventsDir(Seq(
      (10L, "2024-01-01 00:00:00", 7L),
      (11L, "2024-01-01 00:00:00", 7L),
      (12L, "2024-01-01 00:00:00", 7L)))
    val out = Sessionize.sessionHistogram(spark, dir).collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == 3L && out.head.getLong(1) == 1L)
    assert(out.head.getLong(3) == 0L)
  }

  test("gap histogram: bit-length buckets, hand-checked boundaries") {
    val dir = eventsDir(Seq(
      // user 1 gaps: 0s (same second), 1s, 2s, 7s, 8s.
      (1L, "2024-01-01 00:00:00", 1L),
      (2L, "2024-01-01 00:00:00", 1L), // gap 0  -> bucket 0
      (3L, "2024-01-01 00:00:01", 1L), // gap 1  -> bin(2)=10  -> bucket 1
      (4L, "2024-01-01 00:00:03", 1L), // gap 2  -> bin(3)=11  -> bucket 1
      (5L, "2024-01-01 00:00:10", 1L), // gap 7  -> bin(8)     -> bucket 3
      (6L, "2024-01-01 00:00:18", 1L))) // gap 8 -> bin(9)     -> bucket 3
    val out = Sessionize.gapHistogram(spark, dir).collect()
      .map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out(0) == ((1L, 0L, 0L, 0.2)))
    assert(out(1) == ((2L, 1L, 2L, 0.4)))
    assert(out(3) == ((2L, 7L, 8L, 0.4)))
    assert(!out.contains(2))
  }

  test("gap histogram tiles all gaps and buckets bound their gaps") {
    val rows = Sessionize.gapHistogram(spark, Sf001).collect()
    assert(rows.nonEmpty)
    val nUsers = graft.core.Sources.events(spark, Sf001)
      .select("user_id").distinct().count()
    val nEvents = graft.core.Sources.events(spark, Sf001).count()
    assert(rows.map(_.getLong(1)).sum == nEvents - nUsers)
    rows.foreach { r =>
      val b = r.getInt(0)
      val lo = (1L << b) - 1
      val hi = (1L << (b + 1)) - 1
      assert(r.getLong(2) >= lo && r.getLong(3) < hi)
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0)
    }
  }

  test("histogram tiles the real event log exactly") {
    val rows = Sessionize.sessionHistogram(spark, Sf001).collect()
    assert(rows.nonEmpty)
    val totalEvents = rows.map(r => r.getLong(0) * r.getLong(1)).sum
    assert(totalEvents ==
      graft.core.Sources.events(spark, Sf001).count())
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1)) // users <= sessions per size
      assert(r.getLong(4) <= r.getLong(3) || r.getLong(1) == 1L)
    }
  }
}

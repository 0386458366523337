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

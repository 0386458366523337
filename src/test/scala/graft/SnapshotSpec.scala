package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.Snapshot

class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  private val df = Seq(
    (1, ts("2001-01-05"), "a"),
    (2, ts("2001-01-31"), "b"),
    (3, ts("2001-01-31"), "c"), // two rows on the January snapshot day
    (4, ts("2001-02-10"), "d")
  ).toDF("id", "snap_ts", "payload")

  test("lastDates yields one row per month with the max date") {
    val got = Snapshot.lastDates(df, $"snap_ts")
      .orderBy("mes").as[(java.sql.Date, java.sql.Date)].collect()
    assert(got.toSeq == Seq(
      (java.sql.Date.valueOf("2001-01-01"), java.sql.Date.valueOf("2001-01-31")),
      (java.sql.Date.valueOf("2001-02-01"), java.sql.Date.valueOf("2001-02-10"))))
  }

  test("atMonthEnd keeps exactly the rows on each month's last snapshot date") {
    val ids = Snapshot.atMonthEnd(df, $"snap_ts")
      .select("id").as[Int].collect().sorted
    assert(ids.toSeq == Seq(2, 3, 4))
  }

  test("month-end selection plans as aggregate + broadcast join (no window shuffle of the fact)") {
    val plan = Snapshot.atMonthEnd(df, $"snap_ts")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("Window"), plan)
  }
}

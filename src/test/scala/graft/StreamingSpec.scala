package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventsStream

/** The streaming demo: the same tumbling-window aggregate produces the same
  * result in streaming mode (via MemoryStream + complete output) as in
  * batch mode, and accepts a watermark. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val rows = Seq(
    (1L, ts("2024-01-01 10:00:00"), "click", 1.5),
    (2L, ts("2024-01-01 23:59:59"), "click", 2.5),
    (3L, ts("2024-01-02 00:00:00"), "view", 10.0),
    (4L, ts("2024-01-02 12:00:00"), "click", 4.0))

  private def toDf(s: Seq[(Long, Timestamp, String, Double)]) =
    s.toDF("event_id", "ts", "event_type", "value")

  test("streaming daily aggregate matches the batch aggregate") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, String, Double)]
    stream.addData(rows: _*)

    val q = EventsStream.dailyAggStream(
      stream.toDF().toDF("event_id", "ts", "event_type", "value"))
      .writeStream.format("memory").queryName("daily_agg_test")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("daily_agg_test")
      .orderBy("dia", "event_type")
      .collect().map(_.toSeq).toSeq
    val batch = EventsStream.dailyAgg(toDf(rows))
      .orderBy("dia", "event_type")
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch)
    assert(batch.length == 3) // (jan1 click), (jan2 click), (jan2 view)
  }
}

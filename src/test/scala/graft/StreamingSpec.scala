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

  test("sessionization closes a session when the gap exceeds the threshold") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), "click", 1.0),
      (1L, ts("2024-01-01 10:10:00"), "click", 2.0), // same session
      (1L, ts("2024-01-01 12:00:00"), "click", 3.0), // new session (gap > 30m)
      (1L, ts("2024-01-01 12:05:00"), "click", 4.0),
      (1L, ts("2024-01-01 15:00:00"), "click", 5.0), // third (stays open)
      (2L, ts("2024-01-01 10:00:00"), "view", 9.0)   // single, stays open
    ).toDF("user_id", "ts", "event_type", "value")
    val sessions = EventsStream.sessionize(events, gapMinutes = 30)
      .collect().sortBy(_.session_start.getTime)
    // Batch evaluation emits gap-closed sessions; each user's trailing
    // session remains open state.
    assert(sessions.length == 2)
    assert(sessions(0).n_events == 2 && sessions(0).total_value == 3.0)
    assert(sessions(1).n_events == 2 && sessions(1).total_value == 7.0)
    assert(sessions.forall(_.user_id == 1L))
  }

  test("sessionize runs as a REAL stream: state encoder survives the state store") {
    // Batch evaluation never touches the state-store serializer Spark
    // codegens for flatMapGroupsWithState, so the driver gate cannot see
    // this class of bug (r13: a package-private SessionState class file
    // made janino reject every accessor and killed the first streaming
    // batch).  Drive an actual MemoryStream through the operator; the
    // no-data-batch engine bug is sidestepped per the sessionize
    // scaladoc note.
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try {
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[(Long, Timestamp, String, Double)]
      val events = stream.toDF().toDF("user_id", "ts", "event_type", "value")
      val q = EventsStream.sessionize(events, gapMinutes = 30)
        .toDF()
        .writeStream.format("memory").queryName("sess_stream_out")
        .outputMode("append").start()
      try {
        // Batch 1: two events in one session; batch 2: a gap > 30m event
        // closes it — the closed session must cross the state store.
        stream.addData((1L, ts("2024-01-01 10:00:00"), "click", 1.0),
          (1L, ts("2024-01-01 10:10:00"), "click", 2.0))
        q.processAllAvailable()
        stream.addData((1L, ts("2024-01-01 12:00:00"), "click", 3.0))
        q.processAllAvailable()
        val closed = spark.table("sess_stream_out").collect()
        assert(closed.length == 1)
        assert(closed.head.getAs[Long]("n_events") == 2L)
        assert(closed.head.getAs[Double]("total_value") == 3.0)
      } finally q.stop()
    } finally
      spark.conf.unset("spark.sql.streaming.noDataMicroBatches.enabled")
  }

  test("stream-static enrichment joins the dim per micro-batch: streaming equals batch") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((10L, "n10", 1, 0.0, "BUILDING"), (20L, "n20", 2, 0.0, "MACHINERY"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val evRows = Seq(
      (1L, ts("2024-01-01 10:00:00"), 10L, "click", 1.5),
      (2L, ts("2024-01-01 11:00:00"), 20L, "click", 2.5),
      (3L, ts("2024-01-02 09:00:00"), 10L, "view", 4.0),
      (4L, ts("2024-01-02 10:00:00"), 99L, "view", 8.0)) // no dim row → NULL segment
    def toEv(s: Seq[(Long, Timestamp, Long, String, Double)]) =
      s.toDF("event_id", "ts", "user_id", "event_type", "value")
    val batch = EventsStream.enrichBySegment(toEv(evRows), dim)
      .orderBy("dia", "segmento").collect().map(_.toString)

    val stream = MemoryStream[(Long, Timestamp, Long, String, Double)]
    // Two micro-batches split mid-day: the per-batch dim join must not
    // care where the cut lands.
    stream.addData(evRows.take(2): _*)
    val q = EventsStream
      .enrichBySegmentStream(
        stream.toDF().toDF("event_id", "ts", "user_id", "event_type", "value"),
        dim)
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      stream.addData(evRows.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("enrich_out")
      .orderBy("dia", "segmento").collect().map(_.toString)
    assert(streamed.toSeq == batch.toSeq)
  }

  test("trending top-K: streaming window counts equal batch, sink ranking matches") {
    implicit val sqlCtx = spark.sqlContext
    val evRows = Seq(
      (1L, ts("2024-01-01 10:00:00"), "click", 1.0),
      (2L, ts("2024-01-01 11:00:00"), "click", 1.0),
      (3L, ts("2024-01-01 12:00:00"), "view", 1.0),
      (4L, ts("2024-01-01 13:00:00"), "view", 1.0),
      (5L, ts("2024-01-01 14:00:00"), "error", 1.0), // tie with signup → type ASC
      (6L, ts("2024-01-01 15:00:00"), "signup", 1.0),
      (7L, ts("2024-01-02 09:00:00"), "view", 1.0))
    val batchTop = EventsStream.trendingTopK(toDf(
      evRows.map { case (id, t, et, v) => (id, t, et, v) }), k = 3)
      .orderBy("dia", "rnk").collect().map(_.toString)
    // The stateful stage streams; ranking is the sink's job (scaladoc) —
    // prove the streamed counts equal the batch counts across an
    // arbitrary micro-batch cut, then rank them the same way.
    val stream = MemoryStream[(Long, Timestamp, String, Double)]
    stream.addData(evRows.take(3): _*)
    val q = EventsStream.trendingTopKStream(
      stream.toDF().toDF("event_id", "ts", "event_type", "value"))
      .writeStream.format("memory").queryName("trend_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      stream.addData(evRows.drop(3): _*)
      q.processAllAvailable()
    } finally q.stop()
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("dia"))
      .orderBy(col("n_events").desc, col("event_type").asc)
    val streamedTop = spark.table("trend_out")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select("dia", "rnk", "event_type", "n_events")
      .orderBy("dia", "rnk").collect().map(_.toString)
    assert(streamedTop.toSeq == batchTop.toSeq)
    // The tie on day 1 (error=1, signup=1 behind click=2, view=2) must
    // cut deterministically: rank 3 is 'error' by type ASC.
    val day1 = spark.table("trend_out").filter(col("dia") === "2024-01-01")
    assert(day1.count() == 4) // all types counted in state...
    assert(batchTop.exists(_.contains("[2024-01-01,3,error,1]"))) // ...top-3 cut ranks error over signup
  }

  test("anomaly monitor: streamed day cells + sink scoring equal batch") {
    implicit val sqlCtx = spark.sqlContext
    // Nine flat days then a 10× spike on day 10, one extra type with
    // too little history to score; split across two micro-batches at an
    // arbitrary cut.
    val evRows = (1 to 9).map(d =>
      (d.toLong, ts(f"2024-01-$d%02d 10:00:00"), "click", 10.0)) ++ Seq(
      (10L, ts("2024-01-10 10:00:00"), "click", 100.0),
      (11L, ts("2024-01-03 11:00:00"), "view", 5.0))
    val batch = EventsStream.anomalyFromEvents(toDf(evRows))
      .orderBy("event_type", "day").collect().map(_.toString)
    val stream = MemoryStream[(Long, Timestamp, String, Double)]
    stream.addData(evRows.take(4): _*)
    val q = EventsStream.anomalyCellsStream(
      stream.toDF().toDF("event_id", "ts", "event_type", "value"))
      .writeStream.format("memory").queryName("anom_cells")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      stream.addData(evRows.drop(4): _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = graft.ops.Changepoint
      .anomalyDaysOf(spark.table("anom_cells"))
      .orderBy("event_type", "day").collect().map(_.toString)
    assert(streamed.toSeq === batch.toSeq)
    // The spike day is flagged; the flat run before it is not; the
    // short 'view' series is unscored.
    assert(batch.exists(s => s.contains("2024-01-10") && s.contains("true")))
    assert(batch.count(_.contains("click")) === 3) // days 8–10 scored
    assert(!batch.exists(_.contains("view")))
  }

  test("foreachBatch lands micro-batches through the idempotent keyed sink") {
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft_stream_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val stream = MemoryStream[(Long, Timestamp, String, Double)]
    stream.addData(rows: _*)
    val q = EventsStream.writeDailyAgg(
      stream.toDF().toDF("event_id", "ts", "event_type", "value"), out, ckpt)
    try {
      q.processAllAvailable()
      // Late replay of an already-seen day: the day's partition is
      // replaced, not duplicated.
      stream.addData((5L, ts("2024-01-02 13:00:00"), "click", 6.0))
      q.processAllAvailable()
    } finally q.stop()
    val table = spark.read.parquet(out)
    assert(table.count() == 3) // (jan1 click), (jan2 click), (jan2 view)
    val jan2Click = table
      .filter($"dia" === java.sql.Date.valueOf("2024-01-02") &&
        $"event_type" === "click")
      .select("n_events").as[Long].collect()
    assert(jan2Click.toSeq == Seq(2L)) // updated in place, no duplicate row
  }

  test("hll_distinct aggregates across micro-batch cuts: streaming equals batch") {
    implicit val sqlCtx = spark.sqlContext
    val day1 = (1 to 120).map(i =>
      (i.toLong, ts("2024-01-01 10:00:00"), i.toLong % 37))
    val day2 = (1 to 80).map(i =>
      (1000L + i, ts("2024-01-02 09:00:00"), i.toLong % 53))
    val all = day1 ++ day2

    val stream = MemoryStream[(Long, Timestamp, Long)]
    val q = EventsStream.dailyDistinctStream(
      stream.toDF().toDF("event_id", "ts", "user_id"))
      .writeStream.format("memory").queryName("hll_stream_test")
      .outputMode("complete").start()
    try {
      // Two separate micro-batches: the day-1 sketch buffer persisted in
      // the state store must merge with the second batch's partial.
      stream.addData(all.take(100): _*)
      q.processAllAvailable()
      stream.addData(all.drop(100): _*)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("hll_stream_test")
      .orderBy("dia").collect().map(_.toSeq).toSeq
    // The streaming surface is HLL-only (exact DISTINCT is unsupported on
    // streams — the gap the sketch closes); batch carries both columns.
    val batch = EventsStream.dailyDistinct(
      all.toDF("event_id", "ts", "user_id"))
      .select("dia", "users_hll")
      .orderBy("dia").collect().map(_.toSeq).toSeq
    assert(streamed == batch)
  }

  test("append mode finalizes a window once and drops beyond-watermark stragglers") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, String, Double)]
    val q = EventsStream.dailyAggStream(
      stream.toDF().toDF("event_id", "ts", "event_type", "value"))
      .writeStream.format("memory").queryName("wm_test")
      .outputMode("append").start()
    try {
      // Day 1 accumulates; nothing can append yet (watermark at origin).
      stream.addData(
        (1L, ts("2024-01-01 10:00:00"), "click", 1.0),
        (2L, ts("2024-01-01 15:00:00"), "click", 2.0))
      q.processAllAvailable()
      // A late-but-WITHIN-watermark day-1 event must still count.
      stream.addData((3L, ts("2024-01-01 11:00:00"), "click", 4.0))
      q.processAllAvailable()
      assert(spark.table("wm_test").isEmpty, "no window may close early")
      // Day 3 advances the watermark past day-1's end + 1-day delay:
      // day 1 finalizes and appends exactly once, with all 3 events.
      stream.addData((4L, ts("2024-01-03 12:00:00"), "view", 8.0))
      q.processAllAvailable()
      val day1 = spark.table("wm_test")
        .filter($"dia" === "2024-01-01").collect()
      assert(day1.length == 1)
      assert(day1.head.getAs[Long]("n_events") == 3L)
      // A day-1 straggler BEYOND the watermark is dropped: no second
      // emission, no revision of the closed window.
      stream.addData((5L, ts("2024-01-01 09:00:00"), "click", 99.0))
      q.processAllAvailable()
      val after = spark.table("wm_test")
        .filter($"dia" === "2024-01-01").collect()
      assert(after.length == 1)
      assert(after.head.getAs[Long]("n_events") == 3L,
        "a beyond-watermark event must never mutate a finalized window")
    } finally q.stop()
  }

  test("streaming dedup drops repeated event ids within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, String, Double)]
    stream.addData(
      (1L, ts("2024-01-01 10:00:00"), "click", 1.0),
      (1L, ts("2024-01-01 10:00:00"), "click", 1.0), // duplicate delivery
      (2L, ts("2024-01-01 11:00:00"), "view", 2.0))
    val q = EventsStream.dedupeStream(
      stream.toDF().toDF("event_id", "ts", "event_type", "value"))
      .writeStream.format("memory").queryName("dedupe_test")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val ids = spark.table("dedupe_test").select("event_id")
      .as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 2L))
  }

  test("stream-stream conversion join matches the batch interval join") {
    implicit val sqlCtx = spark.sqlContext
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "view", 0.0),
      (2L, ts("2024-01-01 10:10:00"), 7L, "purchase", 5.0),  // within 30m
      (3L, ts("2024-01-01 10:40:01"), 7L, "purchase", 6.0),  // 1s too late
      (4L, ts("2024-01-01 12:00:00"), 8L, "view", 0.0),
      (5L, ts("2024-01-01 12:00:00"), 8L, "purchase", 9.0),  // same instant
      (6L, ts("2024-01-01 12:30:00"), 9L, "purchase", 1.0))  // no view
    def df(rows: Seq[(Long, Timestamp, Long, String, Double)]) =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")

    val stream = MemoryStream[(Long, Timestamp, Long, String, Double)]
    stream.addData(ev: _*)
    val q = EventsStream.conversionsStream(
      stream.toDF().toDF("event_id", "ts", "user_id", "event_type", "value"))
      .writeStream.format("memory").queryName("conv_test")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("conv_test")
      .orderBy("view_event_id", "purchase_event_id")
      .collect().map(_.toSeq).toSeq
    val batch = EventsStream.conversionsFromEvents(df(ev))
      .orderBy("view_event_id", "purchase_event_id")
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch)
    // (1 -> 2) inside the window, (4 -> 5) at lag zero; 3 misses by 1s.
    assert(batch.map(r => (r(1), r(2))) == Seq((1L, 2L), (4L, 5L)))
    assert(batch.map(_(5)) == Seq(600L, 0L))
  }

  test("left-outer conversion join: unmatched views flush after the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "view", 0.0),
      (2L, ts("2024-01-01 10:10:00"), 7L, "purchase", 5.0),  // converts 1
      (3L, ts("2024-01-01 11:00:00"), 8L, "view", 0.0),      // never converts
      (4L, ts("2024-01-01 12:00:00"), 9L, "purchase", 9.0))  // no view
    def df(rows: Seq[(Long, Timestamp, Long, String, Double)]) =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")

    val stream = MemoryStream[(Long, Timestamp, Long, String, Double)]
    stream.addData(ev: _*)
    val q = EventsStream.conversionsOuterStream(
      stream.toDF().toDF("event_id", "ts", "user_id", "event_type", "value"))
      .writeStream.format("memory").queryName("conv_outer_test")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // The unmatched view (3) sits in join state until the watermark
      // passes view_ts + window + horizon: a far-later sentinel event in
      // a SECOND micro-batch advances it and flushes the NULL-extended
      // row — the state-timeout semantics under test.
      stream.addData((99L, ts("2024-01-02 10:00:00"), 99L, "view", 0.0))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("conv_outer_test")
      .where(col("view_event_id") =!= 99L) // drop the sentinel's own row
      .orderBy("view_event_id")
      .collect().map(_.toSeq).toSeq
    val batch = EventsStream.conversionsOuterFromEvents(df(ev))
      .orderBy("view_event_id")
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch)
    // View 1 converted at lag 600; view 3 emitted unconverted with NULL
    // lag; purchase 4 has no view and produces nothing.
    assert(batch.map(r => (r(1), r(3), r(4))) ==
      Seq((1L, 1L, 600L), (3L, 0L, null)))
  }

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

  test("sliding 24h/12h window: streaming equals batch, 2 windows per event") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, String, Double)]
    // Two micro-batches so the overlap spans a batch cut.
    stream.addData(rows.take(2): _*)
    stream.addData(rows.drop(2): _*)

    val q = EventsStream.slidingAggStream(
      stream.toDF().toDF("event_id", "ts", "event_type", "value"))
      .writeStream.format("memory").queryName("sliding_agg_test")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("sliding_agg_test")
      .orderBy("ws_sec", "event_type").collect().map(_.toSeq).toSeq
    val batchDf = EventsStream.slidingAgg(toDf(rows))
    val batch = batchDf
      .orderBy("ws_sec", "event_type").collect().map(_.toSeq).toSeq
    assert(streamed == batch)
    // Every event lands in exactly two windows…
    assert(batchDf.agg(sum("n_events")).head.getLong(0) == 2L * rows.length)
    // …12 hours apart, on the 12h grid.
    val starts = batchDf.select("ws_sec").distinct()
      .collect().map(_.getLong(0))
    assert(starts.forall(_ % 43200 == 0))
  }

  test("CDC upsert sink maintains the keepLatest view across late micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft_cdc_out")
      .toString + "/table"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cdc_ckpt").toString
    val b1 = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "click", 1.0),
      (2L, ts("2024-01-01 11:00:00"), 7L, "view", 2.0),
      (3L, ts("2024-01-01 12:00:00"), 8L, "click", 3.0))
    val b2 = Seq( // advances (7, click); new key (9, view)
      (4L, ts("2024-01-02 09:00:00"), 7L, "click", 4.0),
      (5L, ts("2024-01-02 10:00:00"), 9L, "view", 5.0))
    val b3 = Seq( // LATE: older than the stored (7, click) — must NOT regress
      (6L, ts("2024-01-01 09:00:00"), 7L, "click", 99.0),
      // Same-ts tie on (8, click): event_id decides, 7 > 3.
      (7L, ts("2024-01-01 12:00:00"), 8L, "click", 6.0))
    val stream = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val q = EventsStream.writeCdcUpsert(
      stream.toDF().toDF("event_id", "ts", "user_id", "event_type", "value"),
      out, ckpt)
    try {
      stream.addData(b1: _*); q.processAllAvailable()
      stream.addData(b2: _*); q.processAllAvailable()
      stream.addData(b3: _*); q.processAllAvailable()
    } finally q.stop()
    val table = spark.read.parquet(out)
      .orderBy("user_id", "event_type").collect().map(_.toSeq).toSeq
    // The batch truth: keepLatest over ALL rows regardless of arrival order.
    val want = graft.ops.OperatorQueries.keepLatestOf(
      (b1 ++ b2 ++ b3)
        .toDF("event_id", "ts", "user_id", "event_type", "value"))
      .orderBy("user_id", "event_type").collect().map(_.toSeq).toSeq
    assert(table == want)
    // The late row specifically lost: (7, click) kept the day-2 version.
    val sevenClick = table.find(r => r.head == 7L && r(1) == "click").get
    assert(sevenClick.contains(4L), s"late data regressed the row: $sevenClick")
  }

  test("TxLog CDC upsert: keepLatest view, late batches, replayed batch skipped") {
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft_txcdc_out")
      .toString + "/table"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_txcdc_ckpt").toString
    val b1 = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "click", 1.0),
      (2L, ts("2024-01-01 11:00:00"), 7L, "view", 2.0),
      (3L, ts("2024-01-01 12:00:00"), 8L, "click", 3.0))
    val b2 = Seq( // advances (7, click); new key (9, view)
      (4L, ts("2024-01-02 09:00:00"), 7L, "click", 4.0),
      (5L, ts("2024-01-02 10:00:00"), 9L, "view", 5.0))
    val b3 = Seq( // LATE: older than the stored (7, click) — must NOT regress
      (6L, ts("2024-01-01 09:00:00"), 7L, "click", 99.0))
    val stream = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val q = EventsStream.writeTxLogUpsert(
      stream.toDF().toDF("event_id", "ts", "user_id", "event_type", "value"),
      out, ckpt, appId = "txcdc")
    try {
      stream.addData(b1: _*); q.processAllAvailable()
      stream.addData(b2: _*); q.processAllAvailable()
      stream.addData(b3: _*); q.processAllAvailable()
    } finally q.stop()
    def table() = graft.core.TxLog.read(spark, out)
      .orderBy("user_id", "event_type").collect().map(_.toSeq).toSeq
    val want = graft.ops.OperatorQueries.keepLatestOf(
      (b1 ++ b2 ++ b3)
        .toDF("event_id", "ts", "user_id", "event_type", "value"))
      .select("user_id", "event_type", "event_id", "ts", "value")
      .orderBy("user_id", "event_type").collect().map(_.toSeq).toSeq
    assert(table() == want)
    // The at-least-once window: the last batch replays (crash between
    // the sink's commit and the checkpoint advance).  The txn ledger
    // recognizes it — skipped, version and content unchanged.
    val vBefore = graft.core.TxLog.snapshot(spark, out).version
    val replay = (b1 ++ b2 ++ b3)
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    assert(!graft.core.TxLog.mergeBatch(spark,
      EventsStream.latestPerKey(replay), out,
      Seq("user_id", "event_type"), "txcdc", batchId = 2L))
    assert(graft.core.TxLog.snapshot(spark, out).version == vBefore)
    assert(table() == want)
  }

  test("CDC upsert survives stop + crash + restart from checkpoint (exactly-once)") {
    // The restart-recovery proof the batch-cut tests can't give: the
    // query is STOPPED mid-stream, the stored table is left in the
    // mid-swap crash state (renamed aside — the r7 ADVICE #1 window),
    // and a NEW query resumes from the same checkpoint.  A file source
    // (not MemoryStream) makes the restart real: offsets come from the
    // checkpoint, data from disk.
    val dir = java.nio.file.Files.createTempDirectory("graft_cdc_restart")
    val (in, out, ckpt) = (s"$dir/in", s"$dir/table", s"$dir/ckpt")
    val schema = toDf(Nil)
      .withColumn("user_id", lit(0L)).select(
        col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value")).schema
    def land(rows: Seq[(Long, Timestamp, Long, String, Double)]): Unit =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(in)
    def start() = EventsStream.writeCdcUpsert(
      spark.readStream.schema(schema).parquet(in), out, ckpt)

    val b1 = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "click", 1.0),
      (2L, ts("2024-01-01 11:00:00"), 7L, "view", 2.0))
    val b2 = Seq(
      (3L, ts("2024-01-02 09:00:00"), 7L, "click", 3.0),
      (4L, ts("2024-01-02 10:00:00"), 9L, "view", 4.0))
    val b3 = Seq( // arrives only after the restart; older than stored (7,click)
      (5L, ts("2024-01-01 09:00:00"), 7L, "click", 99.0),
      (6L, ts("2024-01-02 11:00:00"), 8L, "click", 5.0))

    land(b1)
    val q1 = start()
    try { q1.processAllAvailable(); land(b2); q1.processAllAvailable() }
    finally q1.stop()

    // Crash simulation: a merge died between its two renames — table
    // gone, .bak holding the data.  A restart must NOT treat the next
    // batch as a first write.
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(out),
      new org.apache.hadoop.fs.Path(out + ".bak")))

    land(b3)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val table = spark.read.parquet(out)
      .orderBy("user_id", "event_type").collect().map(_.toSeq).toSeq
    val want = graft.ops.OperatorQueries.keepLatestOf(
      (b1 ++ b2 ++ b3)
        .toDF("event_id", "ts", "user_id", "event_type", "value"))
      .orderBy("user_id", "event_type").collect().map(_.toSeq).toSeq
    // Exactly-once across the restart: pre-stop keys survive the crash
    // window, the replay added nothing twice, and the late (7, click)
    // row lost against the RESTORED store.
    assert(table == want)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(out + ".bak")))
  }
}

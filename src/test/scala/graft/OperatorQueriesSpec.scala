package graft

import graft.core.RunConfig
import graft.ops.OperatorQueries

class OperatorQueriesSpec extends SparkSpec {

  private val cfg = RunConfig.default

  test("keepLatest (MAX-of-struct aggregate) equals the window formulation") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val ev = graft.core.Sources.events(spark, Sf001)
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val windowed = ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_type", "event_id", "ts", "value")
    val agg = OperatorQueries.keepLatest(spark, Sf001)
    assert(agg.count() == windowed.count())
    assert(agg.exceptAll(windowed).isEmpty && windowed.exceptAll(agg).isEmpty)
  }

  test("scd2 is keepLatest's dual: current slice identical, intervals tile the history") {
    import org.apache.spark.sql.functions._
    val hist = OperatorQueries.scd2(spark, Sf001).cache()
    try {
      // The is_current slice reproduces the compaction exactly.
      val current = hist.filter(col("is_current"))
        .select(col("user_id"), col("event_type"), col("event_id"),
          col("valid_from").as("ts"), col("value"))
      val latest = OperatorQueries.keepLatest(spark, Sf001)
      assert(current.exceptAll(latest).isEmpty &&
        latest.exceptAll(current).isEmpty)
      // Every version row is accounted for (no event lost or invented)...
      assert(hist.count() ==
        graft.core.Sources.events(spark, Sf001).count())
      // ...exactly one open version per key...
      val openPerKey = hist.filter(col("is_current"))
        .groupBy("user_id", "event_type").count()
      assert(openPerKey.filter(col("count") =!= 1).isEmpty)
      // ...and each closed interval ends where the key's next one starts
      // (version n's valid_to = version n+1's valid_from): the intervals
      // TILE the key's history with no gap or overlap.
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("version"))
      val stitched = hist
        .withColumn("next_from", lead(col("valid_from"), 1).over(w))
      assert(stitched
        .filter(col("valid_to").isNotNull &&
          col("valid_to") =!= col("next_from")).isEmpty)
    } finally hist.unpersist()
  }

  test("snapshotDiff classifies I/U/D and drops unchanged keys") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // Hand CDC log: key (1,a) updated after the cutoff, (2,b) unchanged,
    // (3,c) inserted after the cutoff.  The registered query derives both
    // states from one log, so 'D' can't occur there (append-only) — the
    // delete branch is proven below on real data by diffing REVERSED.
    val t0 = java.sql.Timestamp.valueOf("2024-01-10 00:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-01-25 00:00:00")
    val log = Seq(
      (10L, t0, 1L, "a", 1.0, ""), (11L, t1, 1L, "a", 2.0, ""),
      (20L, t0, 2L, "b", 5.0, ""),
      (30L, t1, 3L, "c", 7.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("snapdiff").toString
    log.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val diff = OperatorQueries.snapshotDiff(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getString(2)).toMap
    assert(diff == Map((1L, "a") -> "U", (3L, "c") -> "I"))
  }

  test("snapshotDiff on real data: append-only log yields no deletes, inserts are keys born after the cutoff") {
    import org.apache.spark.sql.functions._
    val diff = OperatorQueries.snapshotDiff(spark, Sf001).cache()
    try {
      // Forward diff of an append-only log: never a delete; inserts are
      // exactly the keys whose FIRST event is after the cutoff.
      assert(diff.filter(col("change") === "D").isEmpty)
      val cutoff = lit("2024-01-21 00:00:00").cast("timestamp")
      val bornAfter = graft.core.Sources.events(spark, Sf001)
        .groupBy("user_id", "event_type")
        .agg(min(col("ts")).as("first_ts"))
        .filter(col("first_ts") >= cutoff)
      assert(diff.filter(col("change") === "I").count() == bornAfter.count())
      // Updates carry both versions, ordered; inserts have no old side.
      assert(diff.filter(col("change") === "U" &&
        (col("old_ts") > col("new_ts") || col("old_event_id").isNull)).isEmpty)
      assert(diff.filter(col("change") === "I" &&
        col("old_event_id").isNotNull).isEmpty)
    } finally diff.unpersist()
  }

  test("minMaxArrayRaw appends the C15 DATE[] period column") {
    val df = OperatorQueries.minMaxArrayRaw(spark, Sf001, cfg)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val periodo = r.getSeq[java.sql.Date](r.fieldIndex("periodo"))
      assert(periodo.length == 2)
      assert(periodo.head == r.getDate(r.fieldIndex("primeira")))
    }
  }

  test("unpivot melts the pivot back to the plain group-by, exactly") {
    import org.apache.spark.sql.functions.{col, expr}
    val melted = OperatorQueries.unpivotMelt(spark, Sf001)
      .collect().map(r => (r.getDate(0).toString, r.getString(1)) ->
        r.getDecimal(2)).toMap
    val direct = graft.core.Sources.lineitem(spark, Sf001)
      .groupBy(expr(graft.core.Frag.mes("l_shipdate")).as("mes"),
        col("l_returnflag"))
      .agg(expr(graft.core.Frag.sumMoney(
        graft.core.Frag.money("l_extendedprice"))).as("receita"))
      .collect().map(r => (r.getDate(0).toString, r.getString(1)) ->
        r.getDecimal(2)).toMap
    assert(melted === direct)
    // The melt must drop NULL cells: every surviving row is a real group.
    assert(melted.keySet === direct.keySet)
  }
}

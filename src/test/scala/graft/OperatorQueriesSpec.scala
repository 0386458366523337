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
}

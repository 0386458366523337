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

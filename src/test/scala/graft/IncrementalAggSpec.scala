package graft

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.ops.IncrementalAgg

/** Incremental rollup maintenance: bit-equality with the full
  * recompute, a genuinely-updated boundary partition, and untouched
  * partitions passing through the anti-join unchanged. */
class IncrementalAggSpec extends SparkSpec {

  import spark.implicits._

  private def prepared = graft.core.Sources.events(spark, Sf001)
    .select(col("event_type"), to_date(col("ts")).as("day"),
      col("ts").cast("bigint").as("sec"),
      expr("CAST(value AS DECIMAL(18,2))").as("cents"))

  test("incremental maintenance is indistinguishable from full recompute") {
    val full = prepared.groupBy(col("event_type"), col("day"))
      .agg(expr("CAST(ROUND(SUM(cents), 2) AS DECIMAL(18,2))").as("receita"),
        count(lit(1)).as("n_events"))
      .collect().map(_.toString).sorted.toSeq
    val inc = IncrementalAgg.dailyRollupOf(prepared)
      .collect().map(_.toString).sorted.toSeq
    assert(inc === full)
  }

  test("the watermark cut genuinely updates an existing partition") {
    // The 36 h lag lands mid-day, so the boundary day must exist on
    // BOTH sides: in the stored state and in the batch's affected set —
    // otherwise the anti-join path is vacuous and the test data proves
    // nothing about partition replacement.
    val maxsec = prepared.agg(max(col("sec"))).collect()(0).getLong(0)
    val cutoff = maxsec - IncrementalAgg.LagSeconds
    val storedDays = prepared.filter(col("sec") <= cutoff)
      .select(col("day")).distinct().as[Date].collect().toSet
    val batchDays = prepared.filter(col("sec") > cutoff)
      .select(col("day")).distinct().as[Date].collect().toSet
    assert(batchDays.intersect(storedDays).nonEmpty,
      "no partition is both stored and affected")
    assert(storedDays.diff(batchDays).nonEmpty,
      "every partition is affected — nothing exercises the anti-join")
  }

  test("hand case: late rows rebuild only their day") {
    // Three days; the cutoff (max sec − 36 h) falls inside day 2, so
    // day 1 rides through untouched while days 2 and 3 recompute.
    // maxsec = 222800 → cutoff = 222800 − 129600 = 93200, inside day 2:
    // day 2 has one stored row (86500) and one batch row (106400), so
    // it is both stored and affected — the replacement case.
    val day = 86400L
    val ev = Seq(
      ("a", Date.valueOf("1970-01-01"), 0L * day + 100, BigDecimal(10)),
      ("a", Date.valueOf("1970-01-02"), 1L * day + 100, BigDecimal(20)),
      ("a", Date.valueOf("1970-01-02"), 1L * day + 20000, BigDecimal(30)),
      ("a", Date.valueOf("1970-01-03"), 2L * day + 50000, BigDecimal(40)))
      .toDF("event_type", "day", "sec", "cents")
      .withColumn("cents", col("cents").cast("decimal(18,2)"))
    val out = IncrementalAgg.dailyRollupOf(ev).collect()
      .map(r => r.getDate(1).toString -> ((r.getDecimal(2).doubleValue,
        r.getLong(3)))).toMap
    assert(out === Map(
      "1970-01-01" -> ((10.0, 1L)),
      "1970-01-02" -> ((50.0, 2L)),
      "1970-01-03" -> ((40.0, 1L))))
  }
}

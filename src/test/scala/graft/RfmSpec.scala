package graft

import org.apache.spark.sql.functions._

import graft.ops.Rfm

/** RFM segmentation: hand-computed quartile boundaries and tie
  * behavior, the partition property (segments tile customers and
  * revenue), and score-range sanity on the real corpus. */
class RfmSpec extends SparkSpec {

  import spark.implicits._

  graft.functions.QuantileSketch.register(spark)

  private def segments(cells: Seq[(Long, Long, Long)])
      : Map[(Int, Int, Int), (Long, Double)] =
    Rfm.rfmOf(cells.toDF("r", "f", "m"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) ->
        (r.getLong(3), r.getDouble(4)))
      .toMap

  test("eight distinct values score two per quartile") {
    // r = 1..8: boundaries at ranks ⌈.25·8⌉=2, ⌈.5·8⌉=4, ⌈.75·8⌉=6 →
    // b = (2, 4, 6); scores: {1,2}→1, {3,4}→2, {5,6}→3, {7,8}→4.
    // f and m constant → always score 1 (ties land low).
    val out = segments((1L to 8L).map(i => (i, 1L, 100L)))
    assert(out === Map(
      (1, 1, 1) -> (2L, 2.0), (2, 1, 1) -> (2L, 2.0),
      (3, 1, 1) -> (2L, 2.0), (4, 1, 1) -> (2L, 2.0)))
  }

  test("a constant metric collapses to score 1: ties land lower") {
    val out = segments(Seq.fill(10)((5L, 5L, 500L)))
    assert(out === Map((1, 1, 1) -> (10L, 50.0)))
  }

  test("segments tile the customer base and its revenue exactly") {
    val cells = graft.core.Sources.orders(spark, Sf001)
      .groupBy(col("o_custkey"))
      .agg(datediff(lit(Rfm.Now).cast("date"),
        to_date(max(col("o_orderdate")))).cast("long").as("r"),
        count(lit(1)).as("f"),
        expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)")
          .as("m"))
    val nCustomers = cells.count()
    val totalCents = cells.agg(sum(col("m"))).collect()(0).getLong(0)
    val out = Rfm.rfmOf(cells).collect()
    assert(out.map(_.getLong(3)).sum === nCustomers)
    // receita_total per segment is cents/100 exactly; recomposing total
    // cents from the doubles must be exact (segment sums are exact
    // integers below 2^53 cents).
    val recomposed = out.map(r => math.round(r.getDouble(4) * 100)).sum
    assert(recomposed === totalCents)
    val scores = out.flatMap(r => Seq(r.getInt(0), r.getInt(1), r.getInt(2)))
    assert(scores.forall(s => s >= 1 && s <= 4))
  }

  test("recency orientation: the most recent customer scores r = 1") {
    // One very recent, the rest old: the recent one must land in the
    // first recency quartile.
    val cells = (1L, 1L, 100L) +: (1 to 7).map(i => (1000L + i, 1L, 100L))
    val out = segments(cells)
    assert(out.keys.exists(_._1 == 1))
    assert(out((1, 1, 1))._1 >= 1L)
  }
}

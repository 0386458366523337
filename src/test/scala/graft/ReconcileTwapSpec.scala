package graft

import org.apache.spark.sql.functions._

import graft.ops.{Reconcile, Twap}

/** Table digests (order independence, shard additivity, single-row
  * sensitivity) and TWAP (hand integrals, burst insensitivity, the
  * unclosed-interval exclusion). */
class ReconcileTwapSpec extends SparkSpec {

  import spark.implicits._

  private def li = graft.core.Sources.lineitem(spark, Sf001)

  test("digest is independent of row order and partitioning") {
    val a = Reconcile.digestOf(li).collect().map(_.toString).sorted.toSeq
    val b = Reconcile.digestOf(li.repartition(13).sortWithinPartitions(
      col("l_extendedprice"))).collect().map(_.toString).sorted.toSeq
    assert(a === b)
  }

  test("shard digests add up to the whole-table digest") {
    val whole = Reconcile.digestOf(li).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val h1 = Reconcile.digestOf(li.filter(col("l_orderkey") % 2 === 0))
    val h2 = Reconcile.digestOf(li.filter(col("l_orderkey") % 2 === 1))
    val merged = h1.unionAll(h2).groupBy(col("l_returnflag"))
      .agg(sum(col("n_rows")).as("n"), sum(col("key_digest")).as("k"),
        sum(col("price_digest")).as("p"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(merged === whole)
  }

  test("a single dropped row changes its group's digest") {
    val victim = li.orderBy(col("l_orderkey"), col("l_linenumber")).limit(1)
      .collect()(0)
    val (ok, ln, rf) = (victim.getLong(0), victim.getInt(3),
      victim.getString(8))
    val full = Reconcile.digestOf(li).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val tampered = Reconcile.digestOf(li.filter(
      !(col("l_orderkey") === ok && col("l_linenumber") === ln))).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(tampered(rf) !== full(rf))
    assert((full.keySet - rf).forall(k => tampered(k) === full(k)))
  }

  private def twapOf(rows: Seq[(String, Long, Long, Long)]) =
    Twap.twapOf(rows.toDF("event_type", "sec", "event_id", "cents"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) Double.NaN else r.getDouble(3))))
      .toMap

  test("twap integrates the step function, hand-checked") {
    // 100 for 10 s, then 200 for 20 s: twap = 5000/30 = 166.666667.
    val out = twapOf(Seq(
      ("a", 0L, 1L, 100L), ("a", 10L, 2L, 200L), ("a", 30L, 3L, 999L)))
    assert(out("a") === ((2L, 30L, math.rint(5000.0 / 30 * 1e6) / 1e6)))
  }

  test("twap shrugs off a burst a plain average would swallow") {
    val rows = Seq(
      ("a", 0L, 1L, 100L), ("a", 50L, 2L, 999L), ("a", 51L, 3L, 999L),
      ("a", 52L, 4L, 100L), ("a", 100L, 5L, 0L))
    val out = twapOf(rows)
    // (100·50 + 999 + 999 + 100·48) / 100 = 117.98, far below the plain
    // mean of the observed values (549.5).
    assert(out("a") === ((4L, 100L, 117.98)))
  }

  test("a lone observation has no closed interval and is excluded") {
    val out = twapOf(Seq(("a", 0L, 1L, 100L), ("b", 0L, 2L, 5L),
      ("b", 7L, 3L, 5L)))
    assert(!out.contains("a"))
    assert(out("b") === ((1L, 7L, 5.0)))
  }

  test("simultaneous observations carry zero weight, id-ordered") {
    val out = twapOf(Seq(
      ("a", 0L, 1L, 999L), ("a", 0L, 2L, 100L), ("a", 10L, 3L, 1L)))
    // Row 1 (id 1) closes instantly at weight 0; row 2 holds 10 s.
    assert(out("a") === ((2L, 10L, 100.0)))
  }
}

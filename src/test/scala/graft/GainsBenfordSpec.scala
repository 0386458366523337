package graft

import org.apache.spark.sql.functions._

import graft.ops.{Benford, Gains}

/** Gains curve (hand deciles, tiling, monotone cumulative shares) and
  * Benford audit (digit extraction, constants, invariants). */
class GainsBenfordSpec extends SparkSpec {

  import spark.implicits._

  graft.functions.QuantileSketch.register(spark)

  test("gains: ten distinct scores land one user per decile, hand-checked") {
    val cells = (1L to 10L).map(s => (s, s * 100L)).toDF("score", "cents")
    val out = Gains.gainsOf(cells).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(out.size === 10)
    assert(out.keys.toSet === (1 to 10).toSet)
    out.foreach { case (_, (users, _, _)) => assert(users === 1L) }
    // Top decile holds score 10 → 1000 of the 5500 total.
    assert(out(10)._3 === math.rint(1000.0 / 5500 * 1e6) / 1e6)
    assert(out(1)._3 === 1.0) // the full walk reaches every cent
  }

  test("gains: cumulative share grows as deciles are added, tiles users") {
    val out = Gains.gainsCurve(spark, Sf001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(3)))
      .sortBy(-_._1)
    val users = graft.core.Sources.events(spark, Sf001)
      .select("user_id").distinct().count()
    assert(out.map(_._2).sum === users)
    val shares = out.map(_._3)
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b })
    assert(math.abs(shares.last - 1.0) < 1e-9)
  }

  test("benford: digit extraction and constants line up") {
    val rows = Benford.firstDigit(spark, Sf001).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    assert(rows.keys.forall(d => d >= 1 && d <= 9))
    rows.foreach { case (d, (n, share, p, dev)) =>
      assert(n > 0L)
      assert(share > 0.0 && share < 1.0)
      assert(p.toString.startsWith(
        Benford.P(d - 1).take(8)), s"digit $d constant")
      assert(dev >= 0.0)
    }
    assert(math.abs(rows.values.map(_._2).sum - 1.0) < 1e-4)
    // The engine-wide extraction rule on literals.
    val dig = spark.sql(
      "SELECT CAST(SUBSTRING(CAST(123456 AS STRING), 1, 1) AS INT)," +
        " CAST(SUBSTRING(CAST(907 AS STRING), 1, 1) AS INT)")
      .collect()(0)
    assert(dig.getInt(0) === 1 && dig.getInt(1) === 9)
  }
}

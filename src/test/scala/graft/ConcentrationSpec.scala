package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.ops.Concentration

/** Herfindahl concentration: hand-computed index values on constructed
  * order books, plus the structural invariants on the real corpus (the
  * gate proves cross-engine equality; this pins the semantics). */
class ConcentrationSpec extends SparkSpec {

  import spark.implicits._

  /** Write a minimal orders table (the three columns hhi reads) into a
    * temp dir and score it. */
  private def hhiOf(rows: Seq[(String, Long, Double)]) = {
    val dir = Files.createTempDirectory("graft_hhi_").toString
    rows.map { case (d, c, v) => (Timestamp.valueOf(d + " 00:00:00"), c, v) }
      .toDF("o_orderdate", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Concentration.hhi(spark, dir).collect()
      .map(r => r.getDate(0).toString -> r).toMap
  }

  test("a single-customer month is perfect concentration: hhi = 1") {
    val got = hhiOf(Seq(("2024-01-05", 7L, 100.0), ("2024-01-20", 7L, 50.0)))
    val r = got("2024-01-01")
    assert(r.getLong(r.fieldIndex("n_customers")) === 1L)
    assert(r.getDouble(r.fieldIndex("hhi")) === 1.0)
    assert(r.getDouble(r.fieldIndex("top1_share")) === 1.0)
  }

  test("two equal customers halve the index; shares follow the split") {
    val got = hhiOf(Seq(
      ("2024-02-01", 1L, 100.0), ("2024-02-15", 2L, 100.0),
      // A second month with a 3:1 split: hhi = (9 + 1) / 16.
      ("2024-03-01", 1L, 300.0), ("2024-03-15", 2L, 100.0)))
    val feb = got("2024-02-01")
    assert(feb.getDouble(feb.fieldIndex("hhi")) === 0.5)
    assert(feb.getDouble(feb.fieldIndex("top1_share")) === 0.5)
    val mar = got("2024-03-01")
    assert(mar.getDouble(mar.fieldIndex("hhi")) === 0.625)
    assert(mar.getDouble(mar.fieldIndex("top1_share")) === 0.75)
  }

  private def giniOf(rows: Seq[(String, Long, Double)]) = {
    val dir = Files.createTempDirectory("graft_gini_").toString
    rows.map { case (d, c, v) => (Timestamp.valueOf(d + " 00:00:00"), c, v) }
      .toDF("o_orderdate", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Concentration.gini(spark, dir).collect()
      .map(r => r.getDate(0).toString -> r).toMap
  }

  test("gini: equality is 0, a 3:1 split is 0.25") {
    val got = giniOf(Seq(
      ("2024-01-05", 7L, 100.0),                          // single customer
      ("2024-02-01", 1L, 100.0), ("2024-02-15", 2L, 100.0), // perfectly even
      ("2024-03-01", 1L, 300.0), ("2024-03-15", 2L, 100.0))) // 3:1
    assert(got("2024-01-01").getDouble(3) === 0.0)
    assert(got("2024-02-01").getDouble(3) === 0.0)
    // sorted cents (10000, 30000): G = (2·70000 − 3·40000)/(2·40000).
    assert(got("2024-03-01").getDouble(3) === 0.25)
  }

  test("gini bounds hold per month on the real corpus") {
    val rows = Concentration.gini(spark, Sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(1)
      val g = r.getDouble(3)
      // Rank-form Gini over positive values lives in [0, 1 − 1/n].
      assert(g >= -1e-6 && g <= 1.0 - 1.0 / n + 1e-6,
        s"month ${r.getDate(0)}: gini $g outside [0, 1-1/$n]")
    }
  }

  test("real-corpus invariants: 1/n ≤ hhi ≤ top1 ≤ 1 and totals tile") {
    val rows = Concentration.hhi(spark, Sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(r.fieldIndex("n_customers"))
      val hhi = r.getDouble(r.fieldIndex("hhi"))
      val top1 = r.getDouble(r.fieldIndex("top1_share"))
      assert(n > 0)
      // 1/n is the perfectly-even floor; top1 ≥ hhi ≥ top1² always
      // (Σ s² ≤ max·Σ s = top1, and Σ s² ≥ top1²); ROUND 6 gives slack.
      assert(hhi >= 1.0 / n - 1e-6 && hhi <= 1.0 + 1e-9)
      assert(top1 + 1e-6 >= hhi && hhi + 1e-6 >= top1 * top1)
    }
    // The month cents must tile the corpus total exactly (integers).
    val total = rows.map(r => r.getLong(r.fieldIndex("cents"))).sum
    val want = graft.core.Sources.orders(spark, Sf001)
      .selectExpr("CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 " +
        "AS BIGINT)) AS BIGINT) AS c")
      .collect().head.getLong(0)
    assert(total === want)
  }

  test("key skew: hand-computed profile on a skewed key") {
    // Key counts: 1, 1, 1, 4 -> 4 keys, 7 rows, max 4, median 1
    // (2·cum >= 5 at cnt=1, cum=3), p99 = 4 (needs cum = 4).
    val df = Seq(1L, 2L, 3L, 4L, 4L, 4L, 4L).toDF("k0")
    val r = graft.ops.Concentration.keySkewOf(df, "k0", "t").collect().head
    assert(r.getString(0) == "t")
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5)) == ((7L, 4L, 4L, 1L, 4L)))
    assert(r.getDouble(6) == 1.75) // avg
    assert(r.getDouble(7) == math.rint(4.0 / 7.0 * 1e6) / 1e6)
    assert(r.getDouble(8) == math.rint(16.0 / 7.0 * 1e6) / 1e6)
  }

  test("key skew: a uniform key has skew factor 1 and median = avg") {
    val df = (1L to 12L).map(i => i % 4).toDF("k0")
    val r = graft.ops.Concentration.keySkewOf(df, "k0", "u").collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5)) == ((12L, 4L, 3L, 3L, 3L)))
    assert(r.getDouble(8) == 1.0)
  }

  test("key skew invariants hold on the real relations") {
    val rows = graft.ops.Concentration.keySkew(spark, Sf001).collect()
    assert(rows.map(_.getString(0)).toSet ==
      Set("events.user_id", "lineitem.l_orderkey"))
    rows.foreach { r =>
      assert(r.getLong(4) <= r.getLong(5) && r.getLong(5) <= r.getLong(3))
      assert(r.getDouble(8) >= 1.0 - 1e-9)
      assert(r.getDouble(7) <= 1.0)
    }
  }
}

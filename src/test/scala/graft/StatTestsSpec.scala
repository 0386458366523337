package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.StatTests

class StatTestsSpec extends SparkSpec {
  import spark.implicits._

  /** Minimal events table with the columns the tests read. */
  private def eventsDir(rows: Seq[(Long, String, Long, String, Double)])
      : String = {
    val dir = Files.createTempDirectory("graft_stats_").toString
    rows.map { case (id, ts, uid, et, v) =>
      (id, Timestamp.valueOf(ts), uid, et, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("spearman: monotone series score exactly ±1") {
    val dir = eventsDir(
      // 'up': strictly increasing daily totals; 'down': decreasing.
      (1 to 5).map(d => (d.toLong, s"2024-01-0$d 10:00:00", 1L, "up",
        d * 10.0)) ++
      (1 to 5).map(d => (100L + d, s"2024-01-0$d 10:00:00", 1L, "down",
        (6 - d) * 10.0)))
    val rho = StatTests.spearman(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(rho("up") == 1.0)
    assert(rho("down") == -1.0)
  }

  test("spearman is outlier-robust where Pearson is not") {
    // Monotone but wildly non-linear: ranks are still perfectly ordered.
    val dir = eventsDir(Seq(
      (1L, "2024-01-01 10:00:00", 1L, "spike", 1.0),
      (2L, "2024-01-02 10:00:00", 1L, "spike", 2.0),
      (3L, "2024-01-03 10:00:00", 1L, "spike", 3.0),
      (4L, "2024-01-04 10:00:00", 1L, "spike", 1000000.0)))
    val rho = StatTests.spearman(spark, dir).collect().head.getDouble(2)
    assert(rho == 1.0)
  }

  test("kendall: monotone series score exactly ±1, ties shrink tau-b") {
    val dir = eventsDir(
      (1 to 5).map(d => (d.toLong, s"2024-01-0$d 10:00:00", 1L, "up",
        d * 10.0)) ++
      (1 to 5).map(d => (100L + d, s"2024-01-0$d 10:00:00", 1L, "down",
        (6 - d) * 10.0)) ++
      // 10, 10, 20: pairs = (tie, conc, conc) -> C=2 D=0 T=1 n0=3,
      // tau-b = 2 / (sqrt(3) * sqrt(2)) = 0.816497 at ROUND-6.
      Seq((201L, "2024-01-01 10:00:00", 1L, "tied", 10.0),
        (202L, "2024-01-02 10:00:00", 1L, "tied", 10.0),
        (203L, "2024-01-03 10:00:00", 1L, "tied", 20.0)))
    val rows = graft.ops.StatTests.kendall(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5))).toMap
    assert(rows("up") == ((10L, 10L, 0L, 0L, 1.0)))
    assert(rows("down") == ((10L, 0L, 10L, 0L, -1.0)))
    assert(rows("tied") == ((3L, 2L, 0L, 1L, 0.816497)))
  }

  test("kendall stays within [-1, 1] on the real corpus and " +
      "pairs tile n0") {
    val rows = graft.ops.StatTests.kendall(spark, Sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) + r.getLong(3) + r.getLong(4) == r.getLong(1))
      assert(math.abs(r.getDouble(5)) <= 1.0 + 1e-9)
    }
  }

  test("spearman bounds and day counts hold on the real corpus") {
    val rows = StatTests.spearman(spark, Sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-9)
      assert(r.getLong(1) >= 1L)
    }
  }

  test("chi2: a perfectly independent grid scores zero") {
    // Two days (two distinct dows), two types, equal cell counts.
    val dir = eventsDir(for {
      d <- Seq("2024-01-01", "2024-01-02")
      t <- Seq("a", "b")
      i <- 1 to 3
    } yield ((d + t + i).hashCode.toLong, s"$d 0$i:00:00", 1L, t, 1.0))
    val r = StatTests.chi2Independence(spark, dir).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L && r.getLong(2) == 12L)
    assert(r.getDecimal(3).doubleValue() == 0.0)
    assert(r.getLong(4) == 1L) // df = (2-1)(2-1)
  }

  test("chi2: a dow-dependent mix scores positive, df matches the grid") {
    val dir = eventsDir(
      // Day 1: only type a; day 2: only type b → maximal dependence.
      (1 to 4).map(i => (i.toLong, s"2024-01-01 0$i:00:00", 1L, "a", 1.0)) ++
      (1 to 4).map(i => (10L + i, s"2024-01-02 0$i:00:00", 1L, "b", 1.0)))
    val r = StatTests.chi2Independence(spark, dir).collect().head
    // 2x2 with perfect separation: chi2 = N = 8.
    assert(r.getDecimal(3).doubleValue() == 8.0)
  }

  test("ks: identical weekday/weekend distributions score 0, disjoint 1") {
    // 2024-01-01 is a Monday; 01-06/07 the weekend.
    val dir = eventsDir(Seq(
      (1L, "2024-01-01 10:00:00", 1L, "same", 10.0),
      (2L, "2024-01-02 10:00:00", 1L, "same", 20.0),
      (3L, "2024-01-06 10:00:00", 1L, "same", 10.0),
      (4L, "2024-01-07 10:00:00", 1L, "same", 20.0),
      (5L, "2024-01-01 10:00:00", 1L, "shift", 1.0),
      (6L, "2024-01-02 10:00:00", 1L, "shift", 2.0),
      (7L, "2024-01-06 10:00:00", 1L, "shift", 3.0),
      (8L, "2024-01-07 10:00:00", 1L, "shift", 4.0)))
    val ks = StatTests.ksWeekend(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(ks("same").getLong(1) == 2L && ks("same").getLong(2) == 2L)
    assert(ks("same").getDouble(4) == 0.0)
    assert(ks("shift").getLong(3) == 4L) // d_num = nA*nB
    assert(ks("shift").getDouble(4) == 1.0)
  }

  test("mann-whitney: hand-computed U and z on disjoint and tied samples") {
    val dir = eventsDir(Seq(
      (1L, "2024-01-01 10:00:00", 1L, "shift", 1.0),
      (2L, "2024-01-02 10:00:00", 1L, "shift", 2.0),
      (3L, "2024-01-06 10:00:00", 1L, "shift", 3.0),
      (4L, "2024-01-07 10:00:00", 1L, "shift", 4.0),
      (5L, "2024-01-01 10:00:00", 1L, "tied", 10.0),
      (6L, "2024-01-02 10:00:00", 1L, "tied", 20.0),
      (7L, "2024-01-06 10:00:00", 1L, "tied", 10.0),
      (8L, "2024-01-07 10:00:00", 1L, "tied", 20.0)))
    val mw = StatTests.mannWhitney(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val sh = mw("shift") // A = {1,2}, B = {3,4}: U_A = 0
    assert(sh.getLong(3) == 0L && sh.getDouble(4) == 0.0)
    // z = (0 - 2) / sqrt(2*2/12 * 5) = -2/sqrt(5/3)
    assert(sh.getDouble(5) ==
      math.rint(-2.0 / math.sqrt(5.0 / 3.0) * 1e6) / 1e6)
    val ti = mw("tied") // symmetric ties: U = mu -> z = 0
    assert(ti.getLong(3) == 4L && ti.getDouble(4) == 2.0)
    assert(ti.getDouble(5) == 0.0)
  }

  test("two-sample tests on the real corpus: bounds and day tiling") {
    val ks = StatTests.ksWeekend(spark, Sf001).collect()
    assert(ks.nonEmpty)
    ks.foreach { r =>
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
      assert(r.getLong(1) + r.getLong(2) >= 1L)
    }
    val mw = StatTests.mannWhitney(spark, Sf001).collect()
      .map(r => r.getString(0) -> r).toMap
    ks.foreach { r =>
      val m = mw(r.getString(0))
      // Same cells: day counts agree across the two tests.
      assert(m.getLong(1) == r.getLong(1) && m.getLong(2) == r.getLong(2))
      // 0 <= U <= nA*nB always.
      assert(m.getLong(3) >= 0L && m.getLong(3) <= 2 * m.getLong(1) * m.getLong(2))
    }
  }

  test("anova: zero within-group variance gives eta2 = 1, flat series NULL") {
    val dir = eventsDir(Seq(
      // 'det': constant within dow, different across dows (two Mondays
      // at 10, two Tuesdays at 20) -> eta2 = 1, F undefined (SSw = 0).
      (1L, "2024-01-01 10:00:00", 1L, "det", 10.0),
      (2L, "2024-01-08 10:00:00", 1L, "det", 10.0),
      (3L, "2024-01-02 10:00:00", 1L, "det", 20.0),
      (4L, "2024-01-09 10:00:00", 1L, "det", 20.0),
      // 'flat': identical everywhere -> SS_total = 0 -> eta2 NULL.
      (5L, "2024-01-01 10:00:00", 1L, "flat", 7.0),
      (6L, "2024-01-02 10:00:00", 1L, "flat", 7.0)))
    val a = StatTests.anovaDow(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val det = a("det")
    assert(det.getLong(1) == 4L && det.getLong(2) == 2L)
    assert(det.getDouble(3) == 1.0)
    assert(det.isNullAt(4)) // F's within-SS denominator is zero
    assert(a("flat").isNullAt(3))
  }

  test("anova on the real corpus: eta2 in [0,1], full day tiling") {
    val rows = StatTests.anovaDow(spark, Sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= 1L && r.getLong(2) <= 7L)
      if (!r.isNullAt(3))
        assert(r.getDouble(3) >= -1e-6 && r.getDouble(3) <= 1.0 + 1e-6)
      if (!r.isNullAt(4)) assert(r.getDouble(4) >= 0.0)
    }
  }

  test("dispersion: hand-computed Fano/CV, constant series is zero") {
    val dir = eventsDir(
      // 'b': daily counts 1,3 -> mean 2, var 2, fano 1, cv sqrt(2)/2.
      Seq((1L, "2024-01-01 10:00:00", 1L, "b", 1.0),
        (2L, "2024-01-02 10:00:00", 1L, "b", 1.0),
        (3L, "2024-01-02 11:00:00", 1L, "b", 1.0),
        (4L, "2024-01-02 12:00:00", 1L, "b", 1.0)) ++
      // 'c': two days x 2 events -> var 0.
      Seq((5L, "2024-01-01 10:00:00", 1L, "c", 1.0),
        (6L, "2024-01-01 11:00:00", 1L, "c", 1.0),
        (7L, "2024-01-02 10:00:00", 1L, "c", 1.0),
        (8L, "2024-01-02 11:00:00", 1L, "c", 1.0)))
    val d = StatTests.dispersion(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val b = d("b")
    assert(b.getLong(1) == 2L && b.getDouble(2) == 2.0)
    assert(b.getDouble(3) == 2.0 && b.getDouble(4) == 1.0)
    assert(b.getDouble(5) == math.rint(math.sqrt(2.0) / 2.0 * 1e6) / 1e6)
    val c = d("c")
    assert(c.getDouble(3) == 0.0 && c.getDouble(4) == 0.0
      && c.getDouble(5) == 0.0)
  }

  test("chi2 on the real corpus: nonnegative, full dow grid") {
    val r = StatTests.chi2Independence(spark, Sf001).collect().head
    assert(r.getLong(0) == 7L) // 30 days cover every weekday
    assert(r.getDecimal(3).doubleValue() >= 0.0)
    assert(r.getLong(4) == (r.getLong(0) - 1) * (r.getLong(1) - 1))
  }

  test("cramers_v: in [0,1], exact sqrt of the chi2/N scaling") {
    val r = StatTests.cramersV(spark, Sf001).collect().head
    val chi2 = r.getDecimal(3).doubleValue()
    val n = r.getLong(2).toDouble
    val minDim = math.min(r.getLong(0), r.getLong(1)).toDouble - 1.0
    val v = r.getDouble(5)
    assert(v >= 0.0 && v <= 1.0)
    assert(v == math.rint(math.sqrt(chi2 / (n * minDim)) * 1e6) / 1e6)
  }

  test("kruskal-wallis: hand-computed H over three dow groups") {
    // 2024-01-01 is a Monday (dow 1 under (day+3)%7+1).  Values by dow:
    // dow1 {100c,400c}, dow2 {200c,500c}, dow3 {300c,600c} — pooled
    // ranks 1..6, R = (5,7,9), Σ(2R)²/n = 620/2 = 310,
    // H = 3·310/(6·7) − 3·7 = 1.142857; no ties so no correction.
    val dir = eventsDir(Seq(
      (1L, "2024-01-01 10:00:00", 1L, "x", 1.0),
      (2L, "2024-01-02 10:00:00", 1L, "x", 2.0),
      (3L, "2024-01-03 10:00:00", 1L, "x", 3.0),
      (4L, "2024-01-08 10:00:00", 1L, "x", 4.0),
      (5L, "2024-01-09 10:00:00", 1L, "x", 5.0),
      (6L, "2024-01-10 10:00:00", 1L, "x", 6.0)))
    val r = StatTests.kruskalWallis(spark, dir).collect().head
    assert(r.getLong(1) == 6L && r.getLong(2) == 3L && r.getLong(3) == 0L)
    assert(r.getDouble(4) == math.rint((3.0 * 310 / 42 - 21) * 1e6) / 1e6)
  }

  test("kruskal-wallis: an all-tied pooled sample yields NULL H, not a crash") {
    // Every day the same revenue: one tie group of size N makes the
    // correction denominator 1 − (N³−N)/(N³−N) = 0 → NULLIF → NULL.
    val dir = eventsDir((1 to 6).map(d =>
      (d.toLong, f"2024-01-$d%02d 10:00:00", 1L, "flat", 7.0)))
    val r = StatTests.kruskalWallis(spark, dir).collect().head
    assert(r.getLong(1) == 6L)
    assert(r.isNullAt(4))
  }

  test("friedman: hand-computed chi2 over two complete weeks") {
    // Two complete Mon–Sun weeks, revenue strictly increasing within
    // each week: within-block ranks 1..7 both weeks → R_j = 2j,
    // ΣR_j² = 4·140, χ²_F = 12·560/(2·7·8) − 3·2·8 = 12.  A third,
    // incomplete week (one day) must be dropped, not ranked.
    val dir = eventsDir(
      (1 to 7).map(d => (d.toLong, f"2024-01-$d%02d 10:00:00", 1L, "x",
        d.toDouble)) ++
      (8 to 14).map(d => (d.toLong, f"2024-01-$d%02d 10:00:00", 1L, "x",
        (d - 7).toDouble)) ++
      Seq((15L, "2024-01-15 10:00:00", 1L, "x", 99.0)))
    val r = StatTests.friedman(spark, dir).collect().head
    assert(r.getLong(1) == 2L && r.getLong(2) == 7L)
    assert(r.getDouble(3) == 12.0)
  }

  test("friedman: no complete week yields no row, not a crash") {
    val dir = eventsDir((1 to 3).map(d =>
      (d.toLong, f"2024-01-$d%02d 10:00:00", 1L, "short", 1.0)))
    assert(StatTests.friedman(spark, dir).collect().isEmpty)
  }

  test("pettitt: hand-computed K and change day on a level shift") {
    // Values 100,200,10000,20000 cents over 4 days: V = (-3,-1,1,3),
    // U = (-3,-4,-3,0) → K = 4 at 2024-01-02 (epoch day 19724),
    // k_share = 4 / (4·5/2) = 0.4.
    val dir = eventsDir(Seq(
      (1L, "2024-01-01 10:00:00", 1L, "x", 1.0),
      (2L, "2024-01-02 10:00:00", 1L, "x", 2.0),
      (3L, "2024-01-03 10:00:00", 1L, "x", 100.0),
      (4L, "2024-01-04 10:00:00", 1L, "x", 200.0)))
    val r = StatTests.pettitt(spark, dir).collect().head
    assert(r.getLong(1) == 4L)
    assert(r.getLong(2) == 4L)
    assert(r.getLong(3) ==
      java.time.LocalDate.of(2024, 1, 2).toEpochDay)
    assert(r.getDouble(4) == 0.4)
  }

  test("pettitt: a single day scores K = 0 (no cut to find)") {
    val dir = eventsDir(Seq(
      (1L, "2024-01-01 10:00:00", 1L, "solo", 5.0)))
    val r = StatTests.pettitt(spark, dir).collect().head
    assert(r.getLong(1) == 1L && r.getLong(2) == 0L)
    assert(r.getDouble(4) == 0.0)
  }

  test("wilcoxon signed-rank: hand-computed week-over-week pairs") {
    // Pairs (day, day−7): +50c, −20c, and one zero difference dropped.
    // |d| ranks: 20→1, 50→2 (avg2 = 2, 4): w2+ = 4, w2− = 2,
    // r_plus_share = 4/6; the identity w2+ + w2− = n(n+1) holds.
    val dir = eventsDir(Seq(
      (1L, "2024-01-01 10:00:00", 1L, "x", 1.0),
      (2L, "2024-01-02 10:00:00", 1L, "x", 2.0),
      (3L, "2024-01-03 10:00:00", 1L, "x", 3.0),
      (4L, "2024-01-08 10:00:00", 1L, "x", 1.5),
      (5L, "2024-01-09 10:00:00", 1L, "x", 1.8),
      (6L, "2024-01-10 10:00:00", 1L, "x", 3.0)))
    val r = StatTests.wilcoxonSigned(spark, dir).collect().head
    assert(r.getLong(1) == 2L)
    assert(r.getLong(2) == 4L && r.getLong(3) == 2L)
    assert(r.getLong(2) + r.getLong(3) == r.getLong(1) * (r.getLong(1) + 1))
    assert(r.getDouble(4) == math.rint(4.0 / 6.0 * 1e6) / 1e6)
  }
}

package graft

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.ops.Forecast

/** Seasonal-naive backtest and new-vs-returning split: hand-computed
  * error totals, the periodic-series win, scoring-window edges, and
  * the tiling invariants on the real corpus. */
class ForecastSpec extends SparkSpec {

  import spark.implicits._

  private def backtest(rows: Seq[(String, Int, Long)])
      : Map[String, (Long, Long, Long, Boolean)] =
    Forecast.naiveBacktestOf(
      rows.map { case (et, d, t) =>
        (et, Date.valueOf(f"2024-01-${d}%02d"), t)
      }.toDF("event_type", "day", "t"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap

  test("ramp series: persistence beats seasonal-naive, hand-checked") {
    // t = 100·d over days 1..10; scored days 8..10: lag-7 errors are
    // 700 each (2100 total), lag-1 errors 100 each (300).
    val out = backtest((1 to 10).map(d => ("a", d, 100L * d)))
    assert(out("a") === ((3L, 2100L, 300L, false)))
  }

  test("period-7 series: seasonal-naive is exact and wins") {
    val cycle = Seq(10L, 20L, 30L, 40L, 50L, 60L, 70L)
    val out = backtest((1 to 14).map(d => ("a", d, cycle((d - 1) % 7))))
    // Days 8..14 repeat days 1..7 → sae_lag7 = 0; lag-1 errors are the
    // in-week steps: 6·10 + |10−70| = 120.
    assert(out("a") === ((7L, 0L, 120L, true)))
  }

  test("types with fewer than 8 observed days are unscored") {
    val out = backtest((1 to 7).map(d => ("b", d, 100L)))
    assert(out.isEmpty)
  }

  private def autocorr(rows: Seq[(String, Int, Long)]) =
    Forecast.weeklyAutocorrOf(
      rows.map { case (et, d, t) =>
        (et, Date.valueOf(f"2024-01-${d}%02d"), t)
      }.toDF("event_type", "day", "t"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))))
      .toMap

  test("cross-corr: lag-0 symmetric, perfect lagged co-movement found") {
    val out = Forecast.crossCorr(spark, Sf001, maxLag = 3)
      .as[(String, String, Int, Long, Option[Double])].collect()
    assert(out.nonEmpty)
    // Lag 0 is symmetric: r(A,B,0) == r(B,A,0) on identical day sets.
    val lag0 = out.filter(_._3 == 0)
      .map(r => ((r._1, r._2), (r._4, r._5))).toMap
    lag0.foreach { case ((a, b), v) =>
      assert(lag0.get((b, a)).contains(v), s"asymmetric lag-0 pair ($a,$b)")
    }
    // Synthetic fixture: B is exactly A shifted one day => r(A,B,1) = 1.
    import java.sql.Timestamp
    val dir = java.nio.file.Files.createTempDirectory("xcorr").toString
    val rows = (1 to 20).flatMap { d =>
      val v = (d * 37 % 11) * 1.0 + 1.0 // non-constant series
      Seq((d.toLong, Timestamp.valueOf(f"2024-01-$d%02d 10:00:00"),
             1L, "a", v, "{}"),
        (100L + d, Timestamp.valueOf(f"2024-01-${d}%02d 10:00:00"),
             1L, "b", 0.0, "{}"))
    } ++ (2 to 21).map { d =>
      val v = ((d - 1) * 37 % 11) * 1.0 + 1.0
      (200L + d, Timestamp.valueOf(
        if (d <= 31) f"2024-01-$d%02d 10:00:00" else "2024-02-01 10:00:00"),
        2L, "c", v, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val fx = Forecast.crossCorr(spark, dir, maxLag = 3)
      .as[(String, String, Int, Long, Option[Double])].collect()
    val ac = fx.find(r => r._1 == "a" && r._2 == "c" && r._3 == 1).get
    assert(ac._4 == 20L)
    assert(ac._5.contains(1.0), s"expected perfect lag-1 corr, got $ac")
  }

  test("ewma: hand-computed halving fold and one-step MAE") {
    import java.sql.Timestamp
    val dir = java.nio.file.Files.createTempDirectory("ewma").toString
    (Seq(
      (1L, "2024-01-01 10:00:00", 1L, "ramp", 10.0),
      (2L, "2024-01-02 10:00:00", 1L, "ramp", 20.0),
      (3L, "2024-01-03 10:00:00", 1L, "ramp", 30.0),
      (4L, "2024-01-01 10:00:00", 1L, "single", 5.0)))
      .map { case (id, ts, uid, et, v) =>
        (id, Timestamp.valueOf(ts), uid, et, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Forecast.ewma(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val ramp = out("ramp")
    // cents 1000,2000,3000: s = 1000 -> 1500 -> 2250;
    // errors |2000-1000| + |3000-1500| = 2500 over 2 steps.
    assert(ramp.getInt(1) == 3)
    assert(ramp.getDouble(2) == 2250.0)
    assert(ramp.getDouble(3) == 1250.0)
    val single = out("single")
    assert(single.getInt(1) == 1)
    assert(single.getDouble(2) == 500.0 && single.getDouble(3) == 0.0)
  }

  test("ewma level stays within the observed range on the real corpus") {
    val rows = Forecast.ewma(spark, Sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(1) >= 1)
      assert(r.getDouble(2) > 0.0) // revenue cents are positive
      assert(r.getDouble(3) >= 0.0)
    }
  }

  test("theil-sen: exact slope on a linear series, outlier-immune") {
    import java.sql.Timestamp
    val dir = java.nio.file.Files.createTempDirectory("theilsen").toString
    ((1 to 5).map(d => (d.toLong, s"2024-01-0$d 10:00:00", 1L, "lin",
      d * 10.0)) ++
      // Linear 10..40 then a 1000000 blowup on day 5: six of the ten
      // pairwise slopes are exactly 1000 cents/day, the four outlier
      // pairs sort above them, and ranks 5 and 6 both land on 1000.
      ((1 to 4).map(d => (100L + d, s"2024-01-0$d 10:00:00", 1L, "rob",
        d * 10.0)) :+
        (105L, "2024-01-05 10:00:00", 1L, "rob", 1000000.0)))
      .map { case (id, ts, uid, et, v) =>
        (id, Timestamp.valueOf(ts), uid, et, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Forecast.theilSen(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out("lin") == ((10L, 1000.0)))
    assert(out("rob") == ((10L, 1000.0)))
  }

  test("theil-sen pair counts are n(n-1)/2 on the real corpus") {
    val days = graft.core.Sources.events(spark, Sf001)
      .selectExpr("event_type", "CAST(ts AS BIGINT) DIV 86400 AS day")
      .distinct().groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = Forecast.theilSen(spark, Sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = days(r.getString(0))
      assert(r.getLong(1) == n * (n - 1) / 2)
    }
  }

  test("mom growth: first month NULL, ratios recompute from cents") {
    val rows = Forecast.momGrowth(spark, Sf001).collect()
      .sortBy(_.getDate(0).toLocalDate.toEpochDay)
    assert(rows.nonEmpty)
    assert(rows.head.isNullAt(2) && rows.head.isNullAt(3))
    rows.sliding(2).foreach {
      case Array(prev, cur) =>
        assert(cur.getLong(2) == prev.getLong(1))
        val want = (cur.getLong(1) - cur.getLong(2)).toDouble / cur.getLong(2)
        assert(cur.getDouble(3) == math.rint(want * 1e6) / 1e6)
      case _ =>
    }
  }

  test("autocorr: a perfect period-7 series scores exactly 1") {
    val cycle = Seq(10L, 20L, 30L, 40L, 50L, 60L, 70L)
    val out = autocorr((1 to 21).map(d => ("a", d, cycle((d - 1) % 7))))
    assert(out("a") === ((14L, Some(1.0))))
  }

  test("autocorr: a constant series has no defined correlation → NULL") {
    val out = autocorr((1 to 14).map(d => ("a", d, 100L)))
    assert(out("a") === ((7L, None)))
  }

  test("autocorr stays in [-1, 1] on the real corpus") {
    val rows = Forecast.weeklyAutocorr(spark, Sf001).collect()
    assert(rows.nonEmpty)
    rows.filterNot(_.isNullAt(2)).foreach { r =>
      assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-9)
    }
  }

  test("new vs returning tiles daily traffic and the user base") {
    val out = Forecast.newVsReturning(spark, Sf001).collect()
      .map(r => r.getDate(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .sortBy(_._1.toLocalDate.toEpochDay)
    val ev = graft.core.Sources.events(spark, Sf001)
    val totalEvents = ev.count()
    val totalUsers = ev.select("user_id").distinct().count()
    assert(out.map(x => x._2._1 + x._2._2).sum === totalEvents)
    assert(out.map(_._2._3).sum === totalUsers)
    // The first observed day has no returning traffic by definition.
    assert(out.head._2._2 === 0L)
    assert(out.head._2._1 > 0L)
  }

  test("new-user flag is per-user, hand-checked") {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
    val df = Seq(
      (1L, "2024-01-01"), (1L, "2024-01-02"),
      (2L, "2024-01-02"), (2L, "2024-01-02"))
      .toDF("user_id", "d")
      .select(col("user_id"), col("d").cast("date").as("day"))
      .withColumn("first_day", min(col("day")).over(w))
      .withColumn("is_new", col("day") === col("first_day"))
    val byDay = df.groupBy("day")
      .agg(sum(when(col("is_new"), 1L).otherwise(0L)).as("n"),
        sum(when(!col("is_new"), 1L).otherwise(0L)).as("r"))
      .collect().map(r => r.getDate(0).toString -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // Day 2: user 1 returns (1 event), user 2 is new (2 events).
    assert(byDay("2024-01-01") === ((1L, 0L)))
    assert(byDay("2024-01-02") === ((2L, 1L)))
  }

  test("seasonal index: hand-computed month-of-year ratios") {
    // Januaries total 100 + 300 (two months, mean 20000c), February
    // 400 (one month, 40000c); overall monthly mean 80000/3 c →
    // index(Jan) = 0.75, index(Feb) = 1.5.
    val dir = java.nio.file.Files.createTempDirectory("seasonal").toString
    Seq(
      (Date.valueOf("2023-01-15"), 100.0),
      (Date.valueOf("2024-01-20"), 300.0),
      (Date.valueOf("2024-02-10"), 400.0))
      .toDF("o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Forecast.seasonalIndex(spark, dir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(got(1) == ((2L, 40000L, 0.75)))
    assert(got(2) == ((1L, 40000L, 1.5)))
  }
}

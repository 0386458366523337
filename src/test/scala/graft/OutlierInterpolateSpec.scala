package graft

import graft.ops.AnalyticsQueries

/** Brute-force recomputations for the IQR-outlier and gap-interpolation
  * operators (the gate proves cross-engine equality; this proves the
  * semantics themselves). */
class OutlierInterpolateSpec extends SparkSpec {

  test("outliers match a brute-force fence computation") {
    val rows = graft.core.Sources.lineitem(spark, Sf001)
      .selectExpr("l_returnflag",
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val got = AnalyticsQueries.outliers(spark, Sf001).collect()
      .map(r => r.getString(0) -> r).toMap
    rows.groupBy(_._1).foreach { case (flag, xs) =>
      val sorted = xs.map(_._2).sorted
      val n = sorted.length
      def pick(p: Double) = sorted(math.ceil(p * n).toInt - 1)
      val (q1, q3) = (pick(0.25), pick(0.75))
      val out = sorted.filter(c =>
        2 * c < 2 * q1 - 3 * (q3 - q1) || 2 * c > 2 * q3 + 3 * (q3 - q1))
      val r = got(flag)
      assert(r.getAs[Long]("n_rows") === n.toLong)
      assert(r.getAs[Long]("q1_cents") === q1)
      assert(r.getAs[Long]("q3_cents") === q3)
      assert(r.getAs[Long]("n_outliers") === out.length.toLong)
      if (out.nonEmpty) {
        assert(r.getAs[Long]("min_outlier_cents") === out.min)
        assert(r.getAs[Long]("max_outlier_cents") === out.max)
      } else {
        assert(r.isNullAt(r.fieldIndex("min_outlier_cents")))
      }
    }
  }

  test("MAD matches the brute-force two-stage median") {
    val rows = graft.core.Sources.lineitem(spark, Sf001)
      .selectExpr("l_returnflag",
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def medianOf(xs: Seq[Long]): Long = {
      val s = xs.sorted
      s(math.ceil(0.5 * s.length).toInt - 1)
    }
    val got = AnalyticsQueries.mad(spark, Sf001).collect()
      .map(r => r.getString(0) -> r).toMap
    rows.groupBy(_._1).foreach { case (flag, xs) =>
      val m = medianOf(xs.map(_._2))
      val mad = medianOf(xs.map(x => math.abs(x._2 - m)))
      assert(got(flag).getAs[Long]("median_cents") === m, flag)
      assert(got(flag).getAs[Long]("mad_cents") === mad, flag)
    }
  }

  test("equi-depth buckets cover all rows with near-equal mass") {
    val rows = AnalyticsQueries.histogramEqDepth(spark, Sf001).collect()
    val total = graft.core.Sources.lineitem(spark, Sf001).count()
    assert(rows.map(_.getAs[Long]("n_rows")).sum === total)
    assert(rows.map(_.getAs[Int]("bucket")).sorted.toSeq === (0 until 8))
    // Bucket ranges are ordered and non-overlapping.
    val ordered = rows.sortBy(_.getAs[Int]("bucket"))
    ordered.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("hi_cents") <= b.getAs[Long]("lo_cents"))
      case _ =>
    }
    // Near-equal mass up to tie distortion: no bucket more than 2x the
    // ideal share on this data.
    val ideal = total.toDouble / 8
    rows.foreach(r =>
      assert(r.getAs[Long]("n_rows") < 2 * ideal, r.toString))
  }

  test("interpolation fills gaps linearly and leaves edges null") {
    val rows = AnalyticsQueries.interpolate(spark, Sf001).collect()
    val series = rows.groupBy(_.getString(1)).view.mapValues(
      _.sortBy(_.getDate(0).toString))
    var checkedGap = false
    series.foreach { case (_, cells) =>
      val centsIdx = cells.head.fieldIndex("cents")
      val filledIdx = cells.head.fieldIndex("filled")
      // Present cells pass through exactly.
      cells.filterNot(_.isNullAt(centsIdx)).foreach { c =>
        assert(c.getDouble(filledIdx) === c.getLong(centsIdx).toDouble)
      }
      // Gap cells: recompute from the nearest present neighbors.
      val present = cells.zipWithIndex.filterNot(_._1.isNullAt(centsIdx))
      cells.zipWithIndex.filter(_._1.isNullAt(centsIdx)).foreach {
        case (c, i) =>
          val prev = present.filter(_._2 < i).lastOption
          val next = present.find(_._2 > i)
          (prev, next) match {
            case (Some((p, pi)), Some((nx, ni))) =>
              val pc = p.getLong(centsIdx).toDouble
              val nc = nx.getLong(centsIdx).toDouble
              val want = pc + (nc - pc) * ((i - pi).toDouble / (ni - pi))
              assert(c.getDouble(filledIdx) === want)
              checkedGap = true
            case _ =>
              assert(c.isNullAt(filledIdx), "edge gaps must stay null")
          }
      }
    }
    assert(checkedGap, "sf0.001 must actually exercise interior gaps")
  }

  test("trimmed mean matches a brute-force ⌈p·n⌉ trim-and-average") {
    val rows = graft.core.Sources.lineitem(spark, Sf001)
      .selectExpr("l_returnflag",
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val got = AnalyticsQueries.trimmedMean(spark, Sf001).collect()
      .map(r => r.getString(0) -> r).toMap
    rows.groupBy(_._1).foreach { case (flag, xs) =>
      val sorted = xs.map(_._2).sorted
      val n = sorted.length
      def pick(p: Double) = sorted(math.ceil(p * n).toInt - 1)
      val (lo, hi) = (pick(0.1), pick(0.9))
      val kept = sorted.filter(c => c >= lo && c <= hi)
      val r = got(flag)
      assert(r.getLong(r.fieldIndex("n_rows")) === n)
      assert(r.getLong(r.fieldIndex("lo_cents")) === lo)
      assert(r.getLong(r.fieldIndex("hi_cents")) === hi)
      assert(r.getLong(r.fieldIndex("n_kept")) === kept.length)
      val want = BigDecimal(kept.sum.toDouble / kept.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(r.fieldIndex("trimmed_mean_cents")) === want)
      // The trim must bite from BOTH ends at sf0.001 — otherwise the
      // test pins only the degenerate keep-everything regime.
      assert(kept.length < n)
      assert(kept.head > sorted.head && kept.last < sorted.last)
    }
  }
}

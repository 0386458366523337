package graft

import org.apache.spark.sql.functions.col

import graft.ops.AnalyticsQueries

class CorrelationSpec extends SparkSpec {

  test("exact-moment Pearson r matches a BigDecimal recomputation") {
    val rows = graft.core.Sources.lineitem(spark, Sf001)
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
      .collect()
      .groupBy(_.getString(0))
    val got = AnalyticsQueries.correlation(spark, Sf001).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n"),
        r.getAs[Double]("corr_qty_price"))).toMap
    assert(got.keySet == rows.keySet)
    rows.foreach { case (flag, rs) =>
      // The same exact integer moments, accumulated in BigDecimal on the
      // driver, then the same double formula.
      var (sx, sy, sxy, sxx, syy) = (BigDecimal(0), BigDecimal(0),
        BigDecimal(0), BigDecimal(0), BigDecimal(0))
      rs.foreach { r =>
        val x = BigDecimal(r.getDouble(1)).setScale(0)
        val y = BigDecimal(r.getDouble(2)).setScale(2,
          BigDecimal.RoundingMode.HALF_UP)
        sx += x; sy += y; sxy += x * y; sxx += x * x; syy += y * y
      }
      val n = rs.length.toDouble
      val r = (n * sxy.toDouble - sx.toDouble * sy.toDouble) /
        (math.sqrt(n * sxx.toDouble - sx.toDouble * sx.toDouble) *
          math.sqrt(n * syy.toDouble - sy.toDouble * sy.toDouble))
      val (gotN, gotR) = got(flag)
      assert(gotN == rs.length.toLong)
      assert(math.abs(gotR - math.rint(r * 1e6) / 1e6) <= 1e-6,
        s"flag=$flag got=$gotR expected=$r")
      assert(gotR >= -1.0 && gotR <= 1.0)
    }
  }
}

package graft

import graft.llm.Profiler

class ProfilerSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val rows = Profiler.profile(spark, dir).collect()
    .map(r => r.getString(0) -> r).toMap

  test("profiles every column from one scan with consistent row counts") {
    val n = graft.core.Sources.documents(spark, dir).count()
    assert(rows.keySet ==
      Set("doc_id", "lang", "source", "text", "n_chars"))
    rows.values.foreach { r =>
      assert(r.getAs[Long]("n_rows") == n)
      assert(r.getAs[Long]("n_nulls") == 0L) // fixture has no nulls
    }
  }

  test("distinct estimates land in the sketch's error band") {
    val docs = graft.core.Sources.documents(spark, dir)
    for (c <- Seq("doc_id", "lang", "source")) {
      val exact = docs.select(c).distinct().count()
      val est = rows(c).getAs[Double]("distinct_est")
      // 3 sigma of 1.04/sqrt(64); tiny-cardinality columns (5 langs, 10
      // sources) sit below the raw estimator's calibrated range, so allow
      // the known small-n overshoot (no linear counting by design).
      assert(est > 0 && math.abs(est - exact) < math.max(0.39 * exact, 60),
        s"$c: est $est vs exact $exact")
    }
  }

  test("min/max bounds render the true column extremes") {
    assert(rows("lang").getAs[String]("min_str") == "de")
    assert(rows("lang").getAs[String]("max_str") == "zh")
    assert(rows("doc_id").getAs[String]("min_str") == "0")
  }
}

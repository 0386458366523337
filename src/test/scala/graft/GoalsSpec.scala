package graft

import org.apache.spark.sql.functions._

import graft.ops.Goals

/** The goal rulebook: hit/miss/no-target statuses (including the
  * goal-exactly-equal-to-target `>=` case at
  * `kpi_fechamento_m_presente/extract.py:177`), exact basis-point
  * percentages, and hierarchy-tiered bonuses. */
class GoalsSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    // (achieved, target, hierarchy)
    (BigDecimal("150.00"), Some(BigDecimal("100.00")), "junior"), // hit
    (BigDecimal("100.00"), Some(BigDecimal("100.00")), "pleno"),  // exactly met -> hit
    (BigDecimal("99.99"), Some(BigDecimal("100.00")), "junior"),  // miss
    (BigDecimal("50.00"), None, "pleno"),                          // no target
    (BigDecimal("50.00"), Some(BigDecimal("0.00")), "junior")      // zero target
  ).toDF("achieved", "target", "hierarchy_level")

  private lazy val out = rows
    .withColumn("status", expr(Goals.status("achieved", "target")))
    .withColumn("pct", expr(Goals.pct("achieved", "target", Goals.SparkDiv)))
    .withColumn("bonus",
      expr(Goals.bonus("achieved", "target", "achieved", "hierarchy_level",
        "0.01", "0.02")))
    .collect()

  test("status ladder: hit / exactly-met / miss / no target / zero target") {
    assert(out.map(_.getAs[String]("status")).toSeq ==
      Seq("Batida", "Batida", "Não Batida", "Sem Meta", "Sem Meta"))
  }

  test("percentage is exact to the basis point") {
    assert(out(0).getAs[Double]("pct") == 150.0)
    assert(out(1).getAs[Double]("pct") == 100.0)
    assert(out(2).getAs[Double]("pct") == 99.99)
    assert(out(3).isNullAt(out(3).fieldIndex("pct")))
    assert(out(4).isNullAt(out(4).fieldIndex("pct")))
  }

  test("bonus applies the tier rate only on hit") {
    assert(out(0).getAs[java.math.BigDecimal]("bonus").doubleValue() == 1.50) // junior 1%
    assert(out(1).getAs[java.math.BigDecimal]("bonus").doubleValue() == 2.00) // pleno 2%
    assert(out(2).getAs[java.math.BigDecimal]("bonus").doubleValue() == 0.0)
    assert(out(3).getAs[java.math.BigDecimal]("bonus").doubleValue() == 0.0)
    assert(out(4).getAs[java.math.BigDecimal]("bonus").doubleValue() == 0.0)
  }
}

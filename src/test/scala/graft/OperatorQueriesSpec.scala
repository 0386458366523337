package graft

import graft.core.RunConfig
import graft.ops.OperatorQueries

class OperatorQueriesSpec extends SparkSpec {

  private val cfg = RunConfig.default

  test("minMaxArrayRaw appends the C15 DATE[] period column") {
    val df = OperatorQueries.minMaxArrayRaw(spark, Sf001, cfg)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val periodo = r.getSeq[java.sql.Date](r.fieldIndex("periodo"))
      assert(periodo.length == 2)
      assert(periodo.head == r.getDate(r.fieldIndex("primeira")))
    }
  }
}

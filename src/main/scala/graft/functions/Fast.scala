package graft.functions

import org.apache.spark.sql.SparkSession

/** One-call, idempotent registration of the fast exact-arithmetic
  * functions ([[LongExactSum]] `bigsum`, [[MoneyCents]] `money_cents`)
  * — ops that spell them in `expr(...)` call this first so direct spec
  * calls work without going through SparkEntry's dispatch (which also
  * registers them). */
object Fast {
  def register(spark: SparkSession): Unit = {
    LongExactSum.register(spark)
    MoneyCents.register(spark)
  }
}

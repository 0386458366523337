package graft.functions

import org.apache.spark.sql.SparkSession

/** One-call, idempotent registration of the fast exact-arithmetic
  * functions ([[LongExactSum]] `bigsum`, [[MoneyCents]] `money_cents`)
  * — ops that spell them in `expr(...)` call this first so direct spec
  * calls work without going through SparkEntry's dispatch (which also
  * registers them). */
object Fast {
  def register(spark: SparkSession): Unit = {
    // Register only when absent: re-registration is harmless but logs a
    // "function replaced" warning per call, and the dispatch wrapper
    // calls this for every query.
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("bigsum")))
      LongExactSum.register(spark)
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("bigprodsum")))
      LongProductSum.register(spark)
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("money_cents")))
      MoneyCents.register(spark)
  }
}

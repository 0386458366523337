package graft

import org.apache.spark.sql.functions._

import graft.core.Sources

/** The distributed sort-rank percentile formulation must be bit-identical
  * to Spark's holistic `percentile()` aggregate (whose single-reducer
  * value buffer it replaces for scale). */
class PercentilesSpec extends SparkSpec {

  test("sort-rank percentiles equal the holistic percentile() aggregate") {
    val dist = graft.ops.AnalyticsQueries.percentiles(spark, Sf001)
      .orderBy("l_returnflag").collect().map(_.toSeq)
    val holistic = Sources.lineitem(spark, Sf001)
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, 0.25D)").as("p25"),
        expr("percentile(l_extendedprice, 0.5D)").as("p50"),
        expr("percentile(l_extendedprice, 0.9D)").as("p90"),
        expr("percentile(l_quantity, 0.5D)").as("median_qty"))
      .orderBy("l_returnflag").collect().map(_.toSeq)
    assert(dist.nonEmpty)
    assert(dist.toSeq == holistic.toSeq) // bit-exact, not approximate
  }
}

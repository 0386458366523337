package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe two-stage aggregation.
  *
  * A plain `groupBy(k).agg(sum)` shuffles every row of a hot key to one
  * reducer; at 100 TB a single skewed key (one giant client, one default
  * category) stalls the stage.  Salting splits each key into `saltBuckets`
  * sub-groups for the first (map-heavy) aggregation, then combines the
  * partials with a second, tiny aggregation keyed on the original columns.
  * SUM/COUNT/MIN/MAX distribute over the split, so results are identical —
  * which is exactly what the DuckDB oracle asserts (`q_ops_salted_agg`
  * hash-matches a plain GROUP BY).
  *
  * AQE's `skewJoin`/`coalescePartitions` handle many cases at runtime;
  * explicit salting remains the tool when a single group (not just a
  * partition) is hot, since AQE cannot split one group.
  */
object SaltedAgg {

  /** Two-stage salted SUM over decimal-exact expressions.
    *
    * @param keys     grouping columns
    * @param sums     (outputName, sumExpression) pairs; each expression is
    *                 aggregated per (keys, salt) then re-summed per keys
    * @param saltBuckets sub-groups per key
    */
  def sums(df: DataFrame, keys: Seq[String],
      sums: Seq[(String, String)], saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val partial = salted
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(sums.map { case (n, e) => expr(s"SUM($e)").as(n) }.head,
        sums.map { case (n, e) => expr(s"SUM($e)").as(n) }.tail: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(sums.map { case (n, _) =>
        expr(s"CAST(ROUND(SUM($n), 2) AS DECIMAL(18,2))").as(n) }.head,
        sums.map { case (n, _) =>
          expr(s"CAST(ROUND(SUM($n), 2) AS DECIMAL(18,2))").as(n) }.tail: _*)
  }
}

package graft


/** Co-located joins via bucketing: two tables bucketed by the join key on
  * the same bucket count join WITHOUT a shuffle exchange — the disk layout
  * IS the partitioning.  This is the scale story for the engine's repeated
  * fact⋈dimension-key joins: at 100 TB, bucketing the fact tables by
  * client/order key removes the dominant shuffle from every pipeline run
  * (the reference re-shuffles implicitly inside Postgres on every query).
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    // Managed tables land in the session's default warehouse; DROP TABLE in
    // the finally block removes their data (warehouse.dir is static config
    // and cannot be pointed at a temp dir per-test).
    spark.sql("DROP TABLE IF EXISTS fact_b")
    spark.sql("DROP TABLE IF EXISTS dim_b")

    Seq.tabulate(1000)(i => (i.toLong % 50, s"v$i"))
      .toDF("k", "v")
      .write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("fact_b")
    Seq.tabulate(50)(i => (i.toLong, s"name$i"))
      .toDF("k", "name")
      .write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("dim_b")

    // Disable broadcast so the join would otherwise need a full shuffle.
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("fact_b").join(spark.table("dim_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(joined.count() == 1000)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS fact_b")
      spark.sql("DROP TABLE IF EXISTS dim_b")
    }
  }
}

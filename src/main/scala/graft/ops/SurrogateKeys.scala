package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Sources
import graft.functions.{CharPolyHash, Mix31}

/** Deterministic surrogate-key assignment with an in-plan collision
  * audit — the dimension-build primitive.  `monotonically_increasing_id`
  * is partition-layout-dependent (two runs disagree) and a global
  * `row_number` is a single-task sort; the scalable, reproducible
  * alternative is a HASH surrogate: `mix31(char_poly_hash(name))` —
  * pure per-row compute, identical on any cluster size, any run, any
  * engine (both links of the chain are the engine-wide shared
  * spellings).
  *
  * A hash surrogate's failure mode is silent collision (two entities
  * merge downstream), so the audit is IN-PLAN, not a side channel: the
  * distinct-surrogate count must equal the distinct-name count or the
  * query fails loudly (`assert_true`, the [[graft.llm.Vocab]]
  * heavy-hitters precondition pattern).  A colliding dimension at this
  * key width (31-bit) is expected around ~65 k entities (birthday
  * bound); production widens the chain to two independent 31-bit hashes
  * (62 bits) the same way — the audit is what makes either safe to rely
  * on.
  *
  * Scale: per-row projection + one distinct aggregate for the audit —
  * no joins, no windows.
  */
object SurrogateKeys {

  def supplierSurrogates(spark: SparkSession, dir: String): DataFrame = {
    CharPolyHash.register(spark)
    val dim = Sources.supplier(spark, dir)
      .select(col("s_suppkey"), col("s_name"))
      .withColumn("surrogate",
        expr(Mix31.sparkSql("char_poly_hash(s_name)")))
    val audit = dim.agg(
      countDistinct(col("s_name")).as("n_names"),
      countDistinct(col("surrogate")).as("n_surrogates"))
    dim.crossJoin(broadcast(audit))
      .filter(coalesce(
        expr("assert_true(n_names = n_surrogates, " +
          "'surrogate collision: distinct surrogates < distinct names')"),
        lit(true)))
      .select(col("s_suppkey"), col("surrogate"))
  }

  val supplierSurrogatesOracle: String = {
    val h = Mix31.duckSql(s"(${CharPolyHash.duckSql("s_name")})")
    s"""SELECT s_suppkey, $h AS surrogate FROM supplier""".stripMargin
  }
}

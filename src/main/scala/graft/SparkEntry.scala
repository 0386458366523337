package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.RunConfig

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator registers here as a named query; entries with
  * an oracle string are hash-checked against DuckDB on the same parquet
  * tables (sf0.01), the rest get a weaker rows-only check.
  */
object SparkEntry {

  final case class Q(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  private val cfg = RunConfig.default

  import graft.kpi._

  val registry: Seq[Q] = Seq(
    Q("q_p1_receita_farmer",
      (s, d) => ReceitaFarmerPassado(s, d, cfg),
      Some(ReceitaFarmerPassado.oracle(cfg))))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ReceitaFarmerPassado(spark, "/root/testdata/sf0.001", cfg)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Sources
import graft.functions.{CharPolyHash, HllSketch, Mix31}

/** One-pass corpus profiler — the health check a curation pipeline runs
  * before (and after) every transformation: per column, null count,
  * distinct-count estimate, and min/max bounds, from a SINGLE scan.
  *
  * Distinct counts use the engine's [[HllSketch]]; string columns are
  * keyed through [[CharPolyHash]] (so the estimate is of the 31-bit hash
  * space — collisions only ever lower it, and identically in every
  * engine).  Min/max are binary-collation string renderings, identical
  * across engines on this ASCII corpus.  One wide aggregate then `stack`
  * to long form: the scan cost is one pass regardless of column count,
  * and the 64-byte sketch per column keeps the aggregation row tiny —
  * this is what makes profiling 100 TB routine rather than a job per
  * column.  All of it is DuckDB-hash-checked ([[profileOracle]]),
  * estimate included.  Beyond the reference surface (its health checks
  * are row-count asserts in `utils/validation.py`).
  */
object Profiler {

  /** (column, BIGINT key expression for the distinct sketch). */
  private val Cols: Seq[(String, String)] = Seq(
    "doc_id" -> "CAST(doc_id AS BIGINT)",
    "lang" -> "char_poly_hash(lang)",
    "source" -> "char_poly_hash(source)",
    "text" -> "char_poly_hash(text)",
    "n_chars" -> "CAST(n_chars AS BIGINT)")

  def profile(spark: SparkSession, dir: String): DataFrame = {
    HllSketch.register(spark)
    CharPolyHash.register(spark)
    val aggs = Cols.flatMap { case (c, k) => Seq(
      expr(s"COUNT($c)").as(s"cnt_$c"),
      expr(s"ROUND(hll_distinct($k), 4)").as(s"dst_$c"),
      expr(s"CAST(MIN($c) AS STRING)").as(s"min_$c"),
      expr(s"CAST(MAX($c) AS STRING)").as(s"max_$c"))
    } :+ count(lit(1)).as("n_rows")
    val wide = Sources.documents(spark, dir).agg(aggs.head, aggs.tail: _*)
    val stacked = Cols.map { case (c, _) =>
      s"'$c', n_rows - cnt_$c, dst_$c, min_$c, max_$c"
    }.mkString(", ")
    wide.select(
      expr(s"stack(${Cols.size}, $stacked) AS " +
        "(column_name, n_nulls, distinct_est, min_str, max_str)"),
      col("n_rows"))
      .select("column_name", "n_rows", "n_nulls", "distinct_est",
        "min_str", "max_str")
  }

  /** DuckDB mirror: one UNION ALL branch per column, each with the same
    * key expression, [[Mix31]] register math, and string renderings. */
  val profileOracle: String = {
    val branches = Cols.map { case (c, _) =>
      val key = c match {
        case "doc_id" | "n_chars" => s"CAST($c AS BIGINT)"
        case _ => CharPolyHash.duckSql(c)
      }
      s"""SELECT '$c' AS column_name,
         |  (SELECT COUNT(*) FROM documents) AS n_rows,
         |  (SELECT COUNT(*) - COUNT($c) FROM documents) AS n_nulls,
         |  (WITH k AS (
         |     SELECT $key AS k FROM documents WHERE $c IS NOT NULL),
         |   h AS (SELECT ${Mix31.duckSql("k")} AS h FROM k),
         |   rw AS (SELECT h & 63 AS reg, h >> 6 AS w FROM h),
         |   regs AS (
         |     SELECT reg, MAX(CASE WHEN w = 0 THEN 26
         |       ELSE 1 + bit_count((w & -w) - 1) END) AS rho
         |     FROM rw GROUP BY reg)
         |   SELECT ROUND(0.709::DOUBLE * 64 * 64 /
         |     (64 - COUNT(*) + SUM(1.0::DOUBLE / (1::BIGINT << rho))), 4)
         |   FROM regs) AS distinct_est,
         |  (SELECT CAST(MIN($c) AS VARCHAR) FROM documents) AS min_str,
         |  (SELECT CAST(MAX($c) AS VARCHAR) FROM documents) AS max_str""".stripMargin
    }
    branches.mkString("\n", "\nUNION ALL\n", "")
  }
}

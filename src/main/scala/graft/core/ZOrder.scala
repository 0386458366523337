package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}

/** Z-order (Morton) clustering — the multi-dimensional companion to
  * [[Sinks.overwriteSorted]].  A single-column sort gives perfect
  * data-skipping on ONE predicate column; interleaving the bits of two
  * columns into one Morton key and sorting by THAT gives bounded min/max
  * footer ranges on BOTH columns in every file, so scans filtered on
  * either dimension (or both) prune.  This is how parquet lakes replace
  * the reference's composite btree indexes
  * (`utils/db_schema_main.py` CREATE INDEX over (farmer, month)) when
  * there is no index structure, only clustering + statistics.
  *
  * The key is pure integer bit math — `(x >> i) & 1` terms shifted to
  * disjoint positions and summed — identical in any engine
  * (ZOrderSpec round-trips it; the registered query's z values are
  * DuckDB-hash-checked).  [[Bits]] = 21 keeps the interleaved key in 42
  * bits, far from BIGINT overflow; inputs are masked to [[Bits]] bits, so
  * callers with wider domains rank-compress first (at 100 TB the
  * clustering columns are usually already dictionary/rank-encoded ids).
  */
object ZOrder {

  val Bits = 21

  /** Engine-neutral Morton interleave as a SQL expression: bit i of `a`
    * lands at position 2i, bit i of `b` at 2i+1.  The terms occupy
    * disjoint bit positions, so `+` is `|` — spelled as `+` because every
    * engine parses it identically.  `shiftLeft`/`shiftRight` spellings
    * differ per engine, hence the two emitters sharing one shape. */
  private def interleave(a: String, b: String,
      shr: (String, Int) => String, shl: (String, Int) => String): String =
    (0 until Bits).flatMap { i =>
      Seq(shl(s"(${shr(a, i)} & 1)", 2 * i),
        shl(s"(${shr(b, i)} & 1)", 2 * i + 1))
    }.mkString("(", " + ", ")")

  /** Spark SQL spelling (functions, not `>>`/`<<` operators, for parser
    * stability). */
  def sparkSql(a: String, b: String): String =
    interleave(s"CAST($a AS BIGINT)", s"CAST($b AS BIGINT)",
      (x, n) => s"shiftright($x, $n)", (x, n) => s"shiftleft($x, $n)")

  /** DuckDB spelling of the identical shape. */
  def duckSql(a: String, b: String): String =
    interleave(s"CAST($a AS BIGINT)", s"CAST($b AS BIGINT)",
      (x, n) => s"($x >> $n)", (x, n) => s"($x << $n)")

  /** Test-side inverse: recover (a, b) from a Morton key. */
  def deinterleave(z: Long): (Long, Long) = {
    var a = 0L; var b = 0L; var i = 0
    while (i < Bits) {
      a |= ((z >> (2 * i)) & 1L) << i
      b |= ((z >> (2 * i + 1)) & 1L) << i
      i += 1
    }
    (a, b)
  }

  /** Cluster a table by the Morton key of two integer columns: one ranged
    * sort, files carry the z column plus tight footer stats on both
    * dimensions. */
  def cluster(df: DataFrame, path: String, colA: String, colB: String,
      files: Int): Unit =
    Sinks.overwriteSorted(
      df.withColumn("z", expr(sparkSql(colA, colB))),
      path, Seq("z"), files)

  /** Registered surface: the Morton key of (o_custkey, o_orderkey) per
    * order — the clustering key [[cluster]] sorts by, hash-checked
    * cross-engine. */
  def zValues(spark: SparkSession, dir: String): DataFrame =
    Sources.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        expr(sparkSql("o_custkey", "o_orderkey")).as("z"))

  val zValuesOracle: String =
    s"""SELECT o_orderkey, o_custkey,
       |  ${duckSql("o_custkey", "o_orderkey")} AS z
       |FROM orders""".stripMargin
}

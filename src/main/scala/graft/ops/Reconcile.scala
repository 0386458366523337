package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Frag, Sources}

/** Cross-engine table fingerprints — the data-reconciliation primitive:
  * "is the copy of this table over there byte-for-byte the same data?"
  * asked between a lake and a warehouse, before and after a migration,
  * or across replicas, WITHOUT moving the data — each side computes a
  * tiny digest and only digests travel.
  *
  * The fingerprint must be (a) order-independent (no engine sorts 100 TB
  * to checksum it), (b) mergeable (shards digest independently), and
  * (c) reproducible cross-engine.  A SUM of per-row [[graft.functions
  * .Mix31]] hashes over a canonical integer row encoding has all three:
  * addition commutes over any partitioning, partial sums merge, and the
  * mixer chain is the engine-wide shared spelling.  Row encoding here:
  * the TPC-H lineitem natural key folded injectively
  * (orderkey·10 + linenumber — the [[QualityChecks]] convention)
  * combined with the cents-exact price, each mixed SEPARATELY and
  * summed modulo nothing (int64 wraparound never occurs: n · 2^31 <
  * 2^63 until n ≈ 4.3·10⁹ rows per group — beyond that, split digests
  * by a partition column, which reconciliation does anyway).
  *
  * Output: one digest row per return flag (so a mismatch localizes to a
  * partition, the standard drill-down) — n_rows, key_digest,
  * price_digest.  Two tables agree iff every (group, digest) row
  * matches; the driver gate IS a live reconciliation: DuckDB
  * independently computes the digests and the hash-compare proves both
  * engines see identical data.
  *
  * Scale: one scan, map-side partial sums, a #groups-row exchange —
  * the same plan as any SUM.
  */
object Reconcile {

  def tableDigest(spark: SparkSession, dir: String): DataFrame =
    digestOf(Sources.lineitem(spark, dir))

  /** Core over a prepared lineitem frame — spec-testable. */
  private[graft] def digestOf(li: DataFrame): DataFrame = {
    val keyHash = graft.functions.Mix31
      .sparkSql("l_orderkey * 10 + l_linenumber")
    val priceHash = graft.functions.Mix31
      .sparkSql(s"CAST(${Frag.money("l_extendedprice")} * 100 AS BIGINT)")
    li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        sum(expr(keyHash)).as("key_digest"),
        sum(expr(priceHash)).as("price_digest"))
  }

  val tableDigestOracle: String = {
    val keyHash = graft.functions.Mix31
      .duckSql("(l_orderkey * 10 + l_linenumber)")
    val priceHash = graft.functions.Mix31
      .duckSql(s"CAST(${Frag.money("l_extendedprice")} * 100 AS BIGINT)")
    s"""SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows,
       |  CAST(SUM($keyHash) AS BIGINT) AS key_digest,
       |  CAST(SUM($priceHash) AS BIGINT) AS price_digest
       |FROM lineitem GROUP BY 1""".stripMargin
  }
}

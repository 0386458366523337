package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.{Frag, Sources}
import graft.functions.BloomRuntimeFilter

/** Semi-join reduction of a fact scan by a Bloom filter built over a
  * selective dimension — urgent-order revenue by return flag, where the
  * lineitem side is pre-filtered by a bloom over urgent `o_orderkey`s
  * BEFORE it reaches the join shuffle.  This is the single biggest
  * shuffle lever at 100 TB: only ~1/5 of orders are urgent, so 4/5 of
  * the fact table is dropped at the scan stage instead of being hashed,
  * serialized, and shuffled only for the join to discard it.  The plan
  * is exactly what Catalyst's `InjectRuntimeFilter` would emit when its
  * heuristics fire — a scalar-subquery `bloom_filter_agg` on the dim
  * side feeding a `might_contain` predicate pushed onto the fact scan —
  * but placed deliberately (see [[graft.functions.BloomRuntimeFilter]]),
  * because at warehouse scale the decisive filters are design choices,
  * not optimizer luck.
  *
  * Correctness does not depend on the bloom: false positives are removed
  * by the exact join that follows, so the registered result is
  * bit-identical to the plain join — which is exactly what the oracle
  * spells (DuckDB has no bloom surface, making the gate a cross-check
  * that pruning changed nothing).  The filter parameters are sized for
  * ~100k dim keys at 8 bits/key (~2% false-positive rate, 100 KB
  * broadcast); at larger dims the numBits scales linearly and stays a
  * broadcast-sized payload where the dim itself would not be.
  */
object BloomPrune {

  private val EstItems = 100000L
  private val NumBits = 800000L

  /** Dir-scoped view names: a shared session querying two sf dirs must
    * not race on one global view (the Manifest fixed-path lesson). */
  private[graft] def viewNames(dir: String): (String, String) = {
    val tag = math.abs(dir.hashCode)
    (s"bloom_dim_orders_$tag", s"bloom_fact_lineitem_$tag")
  }

  def bloomPrune(spark: SparkSession, dir: String): DataFrame = {
    BloomRuntimeFilter.register(spark)
    val (dimView, factView) = viewNames(dir)
    Sources.orders(spark, dir)
      .filter("o_orderpriority = '1-URGENT'")
      .select("o_orderkey")
      .createOrReplaceTempView(dimView)
    Sources.lineitem(spark, dir).createOrReplaceTempView(factView)
    spark.sql(
      s"""SELECT l.l_returnflag,
         |  ${Frag.sumMoney(Frag.money("l.l_extendedprice"))} AS receita,
         |  COUNT(*) AS n
         |FROM $factView l
         |JOIN $dimView o ON l.l_orderkey = o.o_orderkey
         |WHERE graft_might_contain(
         |    (SELECT graft_bloom_agg(xxhash64(o_orderkey), ${EstItems}L, ${NumBits}L)
         |     FROM $dimView),
         |    xxhash64(l.l_orderkey))
         |GROUP BY l.l_returnflag""".stripMargin)
  }

  /** The bloom is invisible to results by construction: plain join+agg. */
  val bloomPruneOracle: String =
    s"""SELECT l.l_returnflag,
       |  ${Frag.sumMoney(Frag.money("l.l_extendedprice"))} AS receita,
       |  COUNT(*) AS n
       |FROM lineitem l
       |JOIN orders o ON l.l_orderkey = o.o_orderkey
       |WHERE o.o_orderpriority = '1-URGENT'
       |GROUP BY l.l_returnflag""".stripMargin
}

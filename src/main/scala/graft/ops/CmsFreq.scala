package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Sources
import graft.functions.Mix31

/** Count-Min point-frequency sketch (Cormode & Muthukrishnan 2005) —
  * the frequency-estimation member of the sketch library next to
  * [[graft.functions.HllSketch]] (distinct), [[graft.functions
  * .KmvSketch]] (set ops), [[graft.functions.HeavyHitters]] (top items)
  * and [[graft.functions.QuantileSketch]] (ranks): a fixed D×W counter
  * grid answering "how often did THIS key occur" for any key, without
  * storing the key space.
  *
  * Unlike the other sketches this one needs NO custom aggregate: the
  * grid IS a (row, bucket) → count table, so building it is a plain
  * hash aggregate with map-side partials (the exchange carries ≤ D·W
  * partial cells per partition), merging shards is cell-wise SUM, and a
  * point estimate is min over the key's D cells — all expressible in
  * both engines over the shared [[Mix31]] chain, so the ESTIMATES
  * THEMSELVES hash-check cross-engine (the KMV convention; HLL's
  * engine-private registers can't do this).  Row hashes are
  * Mix31(key·D + i) — distinct mixer inputs per row give the
  * independent-row behavior the min depends on.
  *
  * The registered query builds the grid over event user_ids (D = 4,
  * W = 64; 150+ users at gate scales guarantee bucket collisions, so
  * the gate pins the genuinely APPROXIMATE regime — CmsSpec asserts at
  * least one probe overcounts) and probes the ten smallest user_ids,
  * emitting exact count, CMS estimate, and the one-sided-error contract
  * `cms_est ≥ exact_n` (CMS never undercounts — every occurrence of the
  * key lands in all D of its cells).  The exact counts are GATE
  * SCAFFOLDING: production persists only the 256-cell grid and answers
  * point queries from it alone; the probe scan exists so the oracle can
  * verify the estimates (the q_an_quantile_sketch_capped pattern).
  *
  * Scale: the grid build is one scan into a ≤ D·W-cell aggregate — no
  * corpus-keyed shuffle at all, the cheapest possible sketch topology —
  * and probing joins a broadcast of the 256-cell grid.  At 100 TB the
  * grid is still 256 rows; width is the accuracy knob (ε = e/W
  * overcount bound at mass N, union-bound over D rows).
  */
object CmsFreq {

  val D = 4
  val W = 64

  private def rowArr = array((0 until D).map(lit(_)): _*)

  private def bucketExpr(key: String): String =
    s"(${Mix31.sparkSql(s"$key * $D + i")} % $W)"

  /** The D×W counter grid over a prepared single-column ("k", long)
    * key stream.  Mergeable: grids over disjoint shards add cell-wise
    * (spec-pinned). */
  private[graft] def countersOf(keys: DataFrame): DataFrame =
    keys.withColumn("i", explode(rowArr))
      .withColumn("b", expr(bucketExpr("k")))
      .groupBy(col("i"), col("b"))
      .agg(count(lit(1)).as("c"))

  /** Point estimates for a prepared ("k", long) probe set: min over the
    * key's D cells.  Missing cells cannot occur for keys present in the
    * stream (their own mass fills all D cells). */
  private[graft] def estimatesOf(counters: DataFrame,
      probes: DataFrame): DataFrame =
    probes.withColumn("i", explode(rowArr))
      .withColumn("b", expr(bucketExpr("k")))
      .join(broadcast(counters), Seq("i", "b"))
      .groupBy(col("k"))
      .agg(min(col("c")).as("cms_est"))

  def cmsFreq(spark: SparkSession, dir: String): DataFrame = {
    val ev = Sources.events(spark, dir)
    val counters = countersOf(ev.select(col("user_id").as("k")))
    val probes = ev.filter(col("user_id") < 10)
      .groupBy(col("user_id").as("k"))
      .agg(count(lit(1)).as("exact_n"))
    // exact_n rides through the estimate aggregation as a grouping key
    // (it is functionally determined by k) so the probe scan runs once.
    probes.withColumn("i", explode(rowArr))
      .withColumn("b", expr(bucketExpr("k")))
      .join(broadcast(counters), Seq("i", "b"))
      .groupBy(col("k"), col("exact_n"))
      .agg(min(col("c")).as("cms_est"))
      .select(col("k").as("user_id"), col("exact_n"), col("cms_est"),
        (col("cms_est") >= col("exact_n")).as("overcount_ok"))
  }

  /** Join-cardinality estimation by CMS inner product (Cormode &
    * Muthukrishnan 2005 §4.2, the AMS F₂ idea carried into the CM grid):
    * |A ⋈ B on k| = Σ_k f_A(k)·f_B(k), and the grid estimate is
    * min over rows i of Σ_b gridA[i,b]·gridB[i,b] — never an
    * undercount, because every true (k, k) match lands in the same cell
    * of every row while collisions only ADD cross terms.  This is the
    * sketch a planner consults to size a join BEFORE running it.
    *
    * The registered query estimates the view ⋈ purchase user_id join —
    * the conversion join [[graft.streaming.EventsStream]] actually runs —
    * and emits the exact size beside the estimate with the one-sided
    * contract `cms_est ≥ exact`, all exact integers, so the estimate
    * itself hash-checks cross-engine (the [[cmsFreq]] convention; the
    * exact side is gate scaffolding — production keeps only the two
    * 256-cell grids).
    *
    * Scale: each grid is a map-side ≤ D·W-cell aggregate over its
    * filtered scan — NO key-wise shuffle on either input, the whole
    * point of estimating instead of joining; the inner product joins two
    * broadcast 256-cell tables, with the products lifted to DECIMAL so
    * the Σ c·c′ accumulation cannot wrap int64 at any n (at 100 TB also
    * widen W, which tightens the ε = e/W error and shrinks each cell's
    * count).  The exact side pays the one user_id shuffle the estimate
    * avoids — which is exactly the comparison the query demonstrates.
    */
  def joinSize(spark: SparkSession, dir: String): DataFrame = {
    val ev = Sources.events(spark, dir)
    def keysOf(t: String) =
      ev.filter(col("event_type") === t).select(col("user_id").as("k"))
    val gridA = countersOf(keysOf("view"))
    val gridB = countersOf(keysOf("purchase"))
    // The inner product accumulates in DECIMAL(38,0), NOT int64: the
    // DuckDB oracle sums BIGINT products into HUGEINT, and at large event
    // counts an int64 Spark sum would wrap silently in legacy mode and
    // break both the cross-engine hash and the one-sided cms_est ≥ exact
    // contract (r7 ADVICE #2).  MIN is taken in decimal and cast to
    // BIGINT only at the end, mirroring the oracle's CAST(MIN(..)).
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val ip = gridA.join(gridB.withColumnRenamed("c", "c2"), Seq("i", "b"))
      .groupBy(col("i"))
      .agg(sum(col("c").cast(dec) * col("c2").cast(dec)).as("ip"))
      .agg(min(col("ip")).cast("long").as("cms_est"))
    val perUser = ev
      .filter(col("event_type").isin("view", "purchase"))
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L))
        .as("n_v"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_p"))
    val exact = perUser
      .agg(sum(col("n_v") * col("n_p")).as("exact_join_rows"),
        sum(col("n_v")).as("n_view"), sum(col("n_p")).as("n_purchase"))
    exact.crossJoin(broadcast(ip))
      .select(col("n_view"), col("n_purchase"), col("exact_join_rows"),
        col("cms_est"), (col("cms_est") >= col("exact_join_rows"))
          .as("overcount_ok"))
  }

  val joinSizeOracle: String = {
    val cellB = Mix31.duckSql(s"(user_id * $D + i)")
    s"""WITH ids AS (SELECT UNNEST(generate_series(0, ${D - 1})) AS i),
       |ga AS (
       |  SELECT i, ($cellB) % $W AS b, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM events CROSS JOIN ids WHERE event_type = 'view'
       |  GROUP BY 1, 2),
       |gb AS (
       |  SELECT i, ($cellB) % $W AS b, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM events CROSS JOIN ids WHERE event_type = 'purchase'
       |  GROUP BY 1, 2),
       |ip AS (
       |  SELECT ga.i, SUM(ga.c * gb.c) AS ip
       |  FROM ga JOIN gb ON ga.i = gb.i AND ga.b = gb.b GROUP BY 1),
       |est AS (SELECT CAST(MIN(ip) AS BIGINT) AS cms_est FROM ip),
       |pu AS (
       |  SELECT user_id,
       |    SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS n_v,
       |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n_p
       |  FROM events WHERE event_type IN ('view', 'purchase') GROUP BY 1),
       |ex AS (
       |  SELECT CAST(SUM(n_v * n_p) AS BIGINT) AS exact_join_rows,
       |    CAST(SUM(n_v) AS BIGINT) AS n_view,
       |    CAST(SUM(n_p) AS BIGINT) AS n_purchase
       |  FROM pu)
       |SELECT n_view, n_purchase, exact_join_rows, cms_est,
       |  cms_est >= exact_join_rows AS overcount_ok
       |FROM ex, est""".stripMargin
  }

  val cmsFreqOracle: String = {
    val cellB = Mix31.duckSql(s"(user_id * $D + i)")
    val probeB = Mix31.duckSql(s"(p.user_id * $D + i.i)")
    s"""WITH ids AS (SELECT UNNEST(generate_series(0, ${D - 1})) AS i),
       |cells AS (
       |  SELECT i, ($cellB) % $W AS b, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM events CROSS JOIN ids GROUP BY 1, 2),
       |probes AS (
       |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_n
       |  FROM events WHERE user_id < 10 GROUP BY 1),
       |est AS (
       |  SELECT p.user_id, p.exact_n, MIN(c.c) AS cms_est
       |  FROM probes p CROSS JOIN ids i
       |  JOIN cells c ON c.i = i.i AND c.b = ($probeB) % $W
       |  GROUP BY 1, 2)
       |SELECT user_id, exact_n, CAST(cms_est AS BIGINT) AS cms_est,
       |  cms_est >= exact_n AS overcount_ok
       |FROM est""".stripMargin
  }
}

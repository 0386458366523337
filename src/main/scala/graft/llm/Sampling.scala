package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Sources
import graft.functions.Mix31

/** Deterministic corpus sampling and splitting — the reproducibility layer
  * a training-data pipeline needs: the SAME document lands in the SAME
  * split/sample on every run, every engine, every cluster size, because
  * assignment is a pure function of the stable `doc_id` (the engine-wide
  * [[Mix31]] hash), never an RNG stream.  `df.sample`/`sampleBy` cannot
  * promise that: their per-partition RNG re-deals whenever partitioning
  * changes, and no other engine can replay it.
  *
  * Scale: both operators are stateless per-row projections/filters — they
  * fuse into the scan under whole-stage codegen, shuffle nothing, and the
  * observed rates concentrate around the target at any data size (mix31 is
  * uniform on the bucket space).  The reference has no sampling surface
  * (it processes full extracts — e.g. `kpi_receita_m_passado/extract.py`
  * reads whole tables); this is part of the beyond-reference LLM-pipeline
  * surface.
  */
object Sampling {

  /** Train/val/test assignment: bucket = mix31(doc_id) mod 100;
    * test = [0, testPct), val = [testPct, testPct+valPct), train = rest.
    * Disjoint and exhaustive by construction (SamplingSpec). */
  def splits(spark: SparkSession, dir: String,
      valPct: Int = 10, testPct: Int = 10): DataFrame =
    Sources.documents(spark, dir)
      .withColumn("bucket",
        expr(s"${Mix31.sparkSql("doc_id")} % 100").cast("int"))
      .withColumn("split",
        when(col("bucket") < testPct, lit("test"))
          .when(col("bucket") < testPct + valPct, lit("val"))
          .otherwise(lit("train")))
      .select(col("doc_id"), col("lang"), col("bucket"), col("split"))

  def splitsOracle(valPct: Int = 10, testPct: Int = 10): String =
    s"""SELECT doc_id, lang,
       |  CAST(${Mix31.duckSql("doc_id")} % 100 AS INT) AS bucket,
       |  CASE WHEN ${Mix31.duckSql("doc_id")} % 100 < $testPct THEN 'test'
       |       WHEN ${Mix31.duckSql("doc_id")} % 100 < ${testPct + valPct}
       |         THEN 'val'
       |       ELSE 'train' END AS split
       |FROM documents""".stripMargin

  /** Per-language sampling rates in basis points (keyed sampling for corpus
    * rebalancing — up-weight scarce languages, down-sample the dominant
    * one).  A doc survives iff mix31(doc_id) mod 10000 < its language's
    * rate: changing one language's rate never re-deals another's sample,
    * and raising a rate strictly grows the kept set (nested samples). */
  val DefaultRates: Seq[(String, Int)] = Seq(
    "en" -> 2500, "zh" -> 7500, "de" -> 7500, "fr" -> 7500, "es" -> 7500)

  /** Stratified deterministic sample, summarized per language (total vs
    * kept vs the basis-point target).  The rates dim is a broadcast join —
    * the per-row filter itself never shuffles. */
  def stratifiedSample(spark: SparkSession, dir: String,
      rates: Seq[(String, Int)] = DefaultRates): DataFrame = {
    import spark.implicits._
    val rateDim = rates.toDF("lang", "rate_bp")
    Sources.documents(spark, dir)
      .join(broadcast(rateDim), Seq("lang"), "inner")
      .withColumn("kept",
        expr(s"${Mix31.sparkSql("doc_id")} % 10000").cast("int")
          < col("rate_bp"))
      .groupBy(col("lang"), col("rate_bp"))
      // Conditional COUNT, not SUM: both engines type COUNT as BIGINT,
      // while DuckDB widens SUM(int) to HUGEINT (a driver-gate hazard).
      .agg(count(lit(1)).as("total_docs"),
        count(when(col("kept"), 1)).as("sampled_docs"))
      .withColumn("observed_bp",
        round(col("sampled_docs") * lit(10000.0) / col("total_docs"), 4))
  }

  /** Uniform default: every language targeted at 20% of the token budget. */
  val DefaultTargets: Seq[(String, Int)] = Seq(
    "en" -> 2000, "zh" -> 2000, "de" -> 2000, "fr" -> 2000, "es" -> 2000)

  /** Domain-mixture reweighting (the DoReMi-style knob, statically
    * solved): given a TARGET token share per language (basis points) and
    * the corpus's ACTUAL per-language token mass, emit the sampling-weight
    * multiplier that moves the mixture to the target
    * (`mix_weight = target_share / actual_share`; >1 up-samples a scarce
    * domain, <1 down-samples a dominant one).  The weights feed
    * [[stratifiedSample]]'s rate table — together they are the
    * measure-then-rebalance loop of a training-mixture pipeline.
    *
    * Shape: one scan with map-side partial SUMs into ≤ #languages groups,
    * a broadcast target dim, and a 1-row broadcast total; token counts are
    * exact integer sums, the shares/weights single IEEE divisions —
    * deterministic across engines at any scale. */
  def mixtureWeights(spark: SparkSession, dir: String,
      targets: Seq[(String, Int)] = DefaultTargets): DataFrame = {
    import spark.implicits._
    val targetDim = targets.toDF("lang", "target_bp")
    val perLang = Sources.documents(spark, dir)
      .withColumn("n_tok", expr("size(split(text, ' '))").cast("long"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
    val total = perLang.agg(sum(col("n_tokens")).as("total_tokens"))
    perLang.join(broadcast(targetDim), Seq("lang"))
      .crossJoin(broadcast(total))
      .withColumn("actual_share",
        col("n_tokens") / col("total_tokens").cast("double"))
      .withColumn("mix_weight",
        (col("target_bp") / lit(10000.0)) /
          (col("n_tokens") / col("total_tokens").cast("double")))
      .select("lang", "target_bp", "n_docs", "n_tokens",
        "actual_share", "mix_weight")
  }

  def mixtureWeightsOracle(
      targets: Seq[(String, Int)] = DefaultTargets): String = {
    val dim = targets.map { case (l, bp) => s"('$l', $bp)" }.mkString(", ")
    s"""WITH t(lang, target_bp) AS (VALUES $dim),
       |p AS (
       |  SELECT lang, COUNT(*) AS n_docs,
       |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
       |  FROM documents GROUP BY 1),
       |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens FROM p)
       |SELECT p.lang, t.target_bp, p.n_docs, p.n_tokens,
       |  p.n_tokens / CAST(tot.total_tokens AS DOUBLE) AS actual_share,
       |  (t.target_bp / 10000.0)
       |    / (p.n_tokens / CAST(tot.total_tokens AS DOUBLE)) AS mix_weight
       |FROM p JOIN t ON p.lang = t.lang, tot""".stripMargin
  }

  def stratifiedSampleOracle(
      rates: Seq[(String, Int)] = DefaultRates): String = {
    val dim = rates.map { case (l, bp) => s"('$l', $bp)" }.mkString(", ")
    s"""WITH rates(lang, rate_bp) AS (VALUES $dim),
       |d AS (
       |  SELECT doc.lang, r.rate_bp,
       |    CASE WHEN ${Mix31.duckSql("doc.doc_id")} % 10000 < r.rate_bp
       |         THEN 1 ELSE 0 END AS kept
       |  FROM documents doc JOIN rates r ON doc.lang = r.lang)
       |SELECT lang, rate_bp,
       |  COUNT(*) AS total_docs,
       |  COUNT(CASE WHEN kept = 1 THEN 1 END) AS sampled_docs,
       |  ROUND(COUNT(CASE WHEN kept = 1 THEN 1 END) * 10000.0::DOUBLE
       |        / COUNT(*), 4) AS observed_bp
       |FROM d GROUP BY lang, rate_bp""".stripMargin
  }

  /** Materialize [[mixtureWeights]] into an actual resampling plan — the
    * step that turns "en should be 0.6× weighted, zh 2.3×" into a
    * concrete dataset: every document of a language appears
    * `floor(weight)` times (full epochs), and the fractional remainder is
    * a deterministic mix31 sample (`mix31(doc_id) mod 10000 <
    * floor(frac·10000)`), so the effective corpus hits the target mixture
    * while staying reproducible doc-by-doc — no RNG stream to replay.
    * Summarized per language: full epochs, fractional basis points, the
    * sampled extra-doc count, and the effective total.  The doubled
    * arithmetic runs on the SAME IEEE doubles in both engines and the
    * threshold goes through floor (never round — half-up vs half-even
    * would disagree on exact .5s).  One scan + broadcast dims; the
    * per-doc sample is scan-fused, the summary ≤ #languages rows. */
  def resamplePlan(spark: SparkSession, dir: String,
      targets: Seq[(String, Int)] = DefaultTargets): DataFrame = {
    val w = mixtureWeights(spark, dir, targets)
      .select(col("lang"), col("n_docs"), col("mix_weight"),
        floor(col("mix_weight")).cast("long").as("epochs_full"),
        floor((col("mix_weight") - floor(col("mix_weight"))) * 10000)
          .cast("int").as("frac_bp"))
    Sources.documents(spark, dir)
      .join(broadcast(w), Seq("lang"))
      .withColumn("extra",
        expr(s"${Mix31.sparkSql("doc_id")} % 10000").cast("int")
          < col("frac_bp"))
      .groupBy(col("lang"))
      .agg(max(col("n_docs")).as("n_docs"),
        max(col("epochs_full")).as("epochs_full"),
        max(col("frac_bp")).as("frac_bp"),
        count(when(col("extra"), 1)).as("docs_extra"))
      .withColumn("effective_docs",
        col("epochs_full") * col("n_docs") + col("docs_extra"))
  }

  def resamplePlanOracle(
      targets: Seq[(String, Int)] = DefaultTargets): String = {
    val dim = targets.map { case (l, bp) => s"('$l', $bp)" }.mkString(", ")
    s"""WITH t(lang, target_bp) AS (VALUES $dim),
       |p AS (
       |  SELECT lang, COUNT(*) AS n_docs,
       |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
       |  FROM documents GROUP BY 1),
       |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens FROM p),
       |w AS (
       |  SELECT p.lang, p.n_docs,
       |    (t.target_bp / 10000.0)
       |      / (p.n_tokens / CAST(tot.total_tokens AS DOUBLE)) AS mw
       |  FROM p JOIN t ON p.lang = t.lang, tot),
       |w2 AS (
       |  SELECT lang, n_docs, mw,
       |    CAST(FLOOR(mw) AS BIGINT) AS epochs_full,
       |    CAST(FLOOR((mw - FLOOR(mw)) * 10000) AS INT) AS frac_bp
       |  FROM w)
       |SELECT d.lang, MAX(w2.n_docs) AS n_docs,
       |  MAX(w2.epochs_full) AS epochs_full, MAX(w2.frac_bp) AS frac_bp,
       |  COUNT(CASE WHEN ${Mix31.duckSql("d.doc_id")} % 10000 < w2.frac_bp
       |             THEN 1 END) AS docs_extra,
       |  MAX(w2.epochs_full) * MAX(w2.n_docs)
       |    + COUNT(CASE WHEN ${Mix31.duckSql("d.doc_id")} % 10000 < w2.frac_bp
       |                 THEN 1 END) AS effective_docs
       |FROM documents d JOIN w2 ON d.lang = w2.lang
       |GROUP BY 1""".stripMargin
  }

  /** Deterministic corpus shuffle for reproducible training order: sort
    * key = mix31(doc_id) — a fixed pseudo-random permutation ANY engine
    * can replay — sharded so the ordering work parallelizes: shard =
    * key mod nShards, position = row offset within the shard under
    * (key, doc_id).  Consumers read shards in id order and rows in pos
    * order for ONE well-defined global order, but no task ever sorts more
    * than 1/nShards of the corpus (each shard's window sorts
    * independently; at 100 TB raise nShards with the corpus).  This is
    * what `orderBy(rand())` cannot give a training pipeline: the same
    * corpus always shuffles into the same order, regardless of engine,
    * partitioning, or cluster size. */
  def shuffleOrder(spark: SparkSession, dir: String,
      nShards: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("skey").asc, col("doc_id").asc)
    Sources.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        expr(Mix31.sparkSql("doc_id")).as("skey"))
      .withColumn("shard", (col("skey") % nShards).cast("int"))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
  }

  def shuffleOrderOracle(nShards: Int = 16): String =
    s"""SELECT doc_id, lang, skey, CAST(skey % $nShards AS INT) AS shard,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY skey % $nShards
       |                          ORDER BY skey, doc_id) - 1 AS BIGINT)
       |    AS pos
       |FROM (SELECT doc_id, lang, ${Mix31.duckSql("doc_id")} AS skey
       |      FROM documents) t""".stripMargin

  /** EXACTLY-k per-stratum uniform sample via the engine's own KMV
    * sketch ([[graft.functions.KmvSketch]]) — bottom-k-by-hash sampling
    * (Beyer et al. 2007's k-minimum-values read as a SAMPLER: the k
    * smallest values of a fixed pseudo-random permutation of the keys
    * ARE a uniform k-subset).  [[stratifiedSample]]'s mod-threshold is
    * Bernoulli — the per-language COUNT varies run-to-run-of-the-data;
    * this gives the exact-size sample an eval-set builder needs, and
    * stays fully deterministic/mergeable where a `rank() ≤ k` window
    * would serialize each language into one sort task.
    *
    * Exactness: doc_ids live below 2³¹ and [[Mix31]] is a BIJECTION on
    * that domain (xorshift and odd-constant multiplication mod 2³¹ are
    * each invertible), so per-language hashes are collision-free —
    * every language yields exactly min(k, n_lang) documents, and the
    * DuckDB mirror (dense-rank over distinct hashes) selects the
    * identical set.
    *
    * Scale: ObjectHashAggregate KMV partials (≤ 8k bytes per
    * (partition, lang)) → one #langs-row exchange → the sampled hash
    * set broadcasts back onto the scan-side computed hash column — the
    * corpus itself never shuffles, no per-language sort anywhere. */
  def sampleKmv(spark: SparkSession, dir: String, k: Int = 32): DataFrame = {
    graft.functions.KmvSketch.register(spark)
    val docs = Sources.documents(spark, dir)
    val picked = docs.groupBy(col("lang"))
      .agg(expr(s"kmv_sketch(doc_id, $k)").as("sk"))
      .select(col("lang"), explode(col("sk")).as("h"))
    docs.withColumn("h", expr(Mix31.sparkSql("doc_id")))
      .join(broadcast(picked), Seq("lang", "h"))
      .select(col("lang"), col("doc_id"), col("source"), col("n_chars"))
  }

  def sampleKmvOracle(k: Int = 32): String =
    s"""WITH h AS (
       |  SELECT lang, doc_id, source, n_chars,
       |    ${Mix31.duckSql("doc_id")} AS h
       |  FROM documents),
       |rk AS (
       |  SELECT lang, h,
       |    DENSE_RANK() OVER (PARTITION BY lang ORDER BY h) AS rk
       |  FROM (SELECT DISTINCT lang, h FROM h) t)
       |SELECT h.lang, h.doc_id, h.source, h.n_chars
       |FROM h JOIN rk ON h.lang = rk.lang AND h.h = rk.h
       |WHERE rk.rk <= $k""".stripMargin

  /** Quality-banded subsampling — the curation move that couples the
    * [[graft.llm.TextAnalysis]] quality signals to the deterministic
    * sampler: a C4-style RULEBOOK (fixed thresholds, not quantiles — no
    * corpus-wide pass, no drift between runs) bands each document
    * low/mid/high, and each band gets its own [[Mix31]] keep rate
    * (heavy down-sample of short/repetitive docs, keep everything
    * natural-looking).  Summarized per (lang, band) for the gate; at
    * scale the per-doc keep verdict IS the sampled corpus and the whole
    * thing stays one scan-fused projection + one tiny aggregate — zero
    * extra shuffle, the [[stratifiedSample]] shape.
    *
    * Determinism: band predicates compare IEEE divisions of exact
    * integers (identical in both engines); the keep predicate is the
    * engine-wide mix31 bucket. */
  def sampleByQuality(spark: SparkSession, dir: String): DataFrame = {
    val banded = Sources.documents(spark, dir).selectExpr(
      "doc_id", "lang",
      "size(split(text, ' ')) AS n_tokens",
      "size(array_distinct(split(text, ' '))) AS n_uniq",
      """size(filter(split(text, ' '),
        | x -> x IN ('the', 'and', 'of', 'a', 'to'))) AS n_stop""".stripMargin,
      "size(regexp_extract_all(text, '[.!?,;:]', 0)) AS n_punct")
      .withColumn("band", expr(QualityBandCase))
      .withColumn("rate_bp", expr(BandRateCase))
    banded
      .withColumn("kept",
        expr(s"${Mix31.sparkSql("doc_id")} % 10000").cast("int")
          < col("rate_bp"))
      .groupBy(col("lang"), col("band"), col("rate_bp"))
      .agg(count(lit(1)).as("total_docs"),
        count(when(col("kept"), 1)).as("sampled_docs"))
      .withColumn("observed_bp",
        round(col("sampled_docs") * lit(10000.0) / col("total_docs"), 4))
  }

  // Shared rulebook text (Spark and DuckDB dialects agree on every
  // construct used): short or repetitive → low; stopword-bearing
  // punctuated prose → high; else mid.
  private val QualityBandCase =
    """CASE WHEN n_tokens < 15
      |       OR n_uniq / CAST(n_tokens AS DOUBLE) < 0.5 THEN 'low'
      |     WHEN n_stop / CAST(n_tokens AS DOUBLE) >= 0.04
      |       AND n_punct >= 3 THEN 'high'
      |     ELSE 'mid' END""".stripMargin
  private val BandRateCase =
    """CASE band WHEN 'low' THEN 500
      |          WHEN 'mid' THEN 5000
      |          ELSE 10000 END""".stripMargin

  /** Temperature-scaled multilingual mixture — the XLM-R/mBERT rebalancing
    * rule `p_lang ∝ mass_lang^α` for α ∈ {1, 1/2, 1/4}: lower temperature
    * flattens the mixture toward uniform so low-resource languages are not
    * drowned by the head language.  The α grid is deliberately the
    * sqrt-CHAIN members of the family: for integer n,
    * `floor(sqrt(n)) = floor(n^(1/2))` and
    * `floor(sqrt(floor(sqrt(n)))) = floor(n^(1/4))` exactly, and IEEE
    * sqrt is correctly rounded on both engines — whereas a generic
    * `pow(x, 0.3)` is libm-dependent and would break the cross-engine
    * hash contract.  Weights are exact BIGINTs; each share is ONE IEEE
    * division of exact integers.
    *
    * Shape: one scan with map-side partial SUMs into ≤ #languages groups
    * plus a 1-row broadcast of the three totals — nothing here grows with
    * the corpus, so the plan is identical at 100 TB. */
  def temperatureMixture(spark: SparkSession, dir: String): DataFrame = {
    val perLang = Sources.documents(spark, dir)
      .withColumn("n_tok", expr("size(split(text, ' '))").cast("long"))
      .groupBy(col("lang"))
      .agg(sum(col("n_tok")).as("n_tokens"))
      .withColumn("w_t05",
        expr("CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) AS BIGINT)"))
      .withColumn("w_t025",
        expr("CAST(FLOOR(SQRT(CAST(w_t05 AS DOUBLE))) AS BIGINT)"))
    val tot = perLang.agg(
      sum(col("n_tokens")).as("tot_raw"),
      sum(col("w_t05")).as("tot_t05"),
      sum(col("w_t025")).as("tot_t025"))
    perLang.crossJoin(broadcast(tot))
      .select(col("lang"), col("n_tokens"), col("w_t05"), col("w_t025"),
        expr("ROUND(n_tokens / CAST(tot_raw AS DOUBLE), 6)").as("share_raw"),
        expr("ROUND(w_t05 / CAST(tot_t05 AS DOUBLE), 6)").as("share_t05"),
        expr("ROUND(w_t025 / CAST(tot_t025 AS DOUBLE), 6)").as("share_t025"))
  }

  def temperatureMixtureOracle(): String =
    """WITH p AS (
      |  SELECT lang,
      |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY 1),
      |w AS (
      |  SELECT lang, n_tokens,
      |    CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS w_t05
      |  FROM p),
      |w2 AS (
      |  SELECT lang, n_tokens, w_t05,
      |    CAST(FLOOR(SQRT(CAST(w_t05 AS DOUBLE))) AS BIGINT) AS w_t025
      |  FROM w),
      |tot AS (
      |  SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot_raw,
      |    CAST(SUM(w_t05) AS BIGINT) AS tot_t05,
      |    CAST(SUM(w_t025) AS BIGINT) AS tot_t025
      |  FROM w2)
      |SELECT lang, n_tokens, w_t05, w_t025,
      |  ROUND(n_tokens / CAST(tot_raw AS DOUBLE), 6) AS share_raw,
      |  ROUND(w_t05 / CAST(tot_t05 AS DOUBLE), 6) AS share_t05,
      |  ROUND(w_t025 / CAST(tot_t025 AS DOUBLE), 6) AS share_t025
      |FROM w2, tot""".stripMargin

  def sampleByQualityOracle(): String =
    s"""WITH sig AS (
       |  SELECT doc_id, lang,
       |    len(string_split(text, ' ')) AS n_tokens,
       |    len(list_distinct(string_split(text, ' '))) AS n_uniq,
       |    len(list_filter(string_split(text, ' '),
       |        x -> x IN ('the', 'and', 'of', 'a', 'to'))) AS n_stop,
       |    len(regexp_extract_all(text, '[.!?,;:]')) AS n_punct
       |  FROM documents),
       |banded AS (
       |  SELECT *, $QualityBandCase AS band FROM sig),
       |rated AS (
       |  SELECT *, $BandRateCase AS rate_bp FROM banded),
       |k AS (
       |  SELECT lang, band, rate_bp,
       |    CASE WHEN ${Mix31.duckSql("doc_id")} % 10000 < rate_bp
       |         THEN 1 ELSE 0 END AS kept
       |  FROM rated)
       |SELECT lang, band, rate_bp,
       |  COUNT(*) AS total_docs,
       |  COUNT(CASE WHEN kept = 1 THEN 1 END) AS sampled_docs,
       |  ROUND(COUNT(CASE WHEN kept = 1 THEN 1 END) * 10000.0 / COUNT(*), 4)
       |    AS observed_bp
       |FROM k GROUP BY 1, 2, 3""".stripMargin

  /** Split-balance audit: χ² independence of (split × lang) over the
    * deterministic [[splits]] assignment — "did the hash split
    * accidentally stratify by language".  A sound Mix31 bucket split is
    * independent of every document attribute, so χ² should sit near its
    * df; a large value means the doc_id space is correlated with
    * language and per-split metrics will not be comparable.  The grid is
    * DENSIFIED the [[graft.ops.StatTests]] way (structural zeros
    * contribute their full (0−e)²/e mass — the term chain is shared
    * verbatim with the dow×type test) and the χ² sum rides the ROUND-9 →
    * DECIMAL drift recipe.
    *
    * Scale: one documents scan into a ≤ 3×#langs aggregate; everything
    * downstream is cell-count-sized. */
  def splitBalance(spark: SparkSession, dir: String,
      valPct: Int = 10, testPct: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val observed = splits(spark, dir, valPct, testPct)
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("o"))
    val splitsRow = observed.agg(collect_set(col("split")).as("ss"))
    val cells = observed.select(col("lang")).distinct()
      .crossJoin(broadcast(splitsRow))
      .select(col("lang"), explode(col("ss")).as("split"))
      .join(observed, Seq("split", "lang"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
    cells
      .withColumn("r", sum(col("o")).over(Window.partitionBy(col("split"))))
      .withColumn("c", sum(col("o")).over(Window.partitionBy(col("lang"))))
      .withColumn("nn", sum(col("o")).over(Window.partitionBy(lit(1))))
      .withColumn("term", expr(graft.ops.StatTests.Chi2Term))
      .agg(
        countDistinct(col("split")).as("n_splits"),
        countDistinct(col("lang")).as("n_langs"),
        max(col("nn")).as("n_docs"),
        expr("CAST(SUM(CAST(ROUND(term, 9) AS DECIMAL(28,9))) " +
          "AS DECIMAL(38,9))").as("chi2"))
      .withColumn("df",
        ((col("n_splits") - 1) * (col("n_langs") - 1)).cast("long"))
  }

  def splitBalanceOracle(valPct: Int = 10, testPct: Int = 10): String =
    s"""WITH sp AS (
       |  SELECT lang,
       |    CASE WHEN ${Mix31.duckSql("doc_id")} % 100 < $testPct THEN 'test'
       |         WHEN ${Mix31.duckSql("doc_id")} % 100 < ${testPct + valPct}
       |           THEN 'val'
       |         ELSE 'train' END AS split
       |  FROM documents),
       |obs AS (
       |  SELECT split, lang, COUNT(*) AS o FROM sp GROUP BY 1, 2),
       |cells AS (
       |  SELECT s.split, l.lang, COALESCE(obs.o, 0) AS o
       |  FROM (SELECT DISTINCT split FROM obs) s
       |  CROSS JOIN (SELECT DISTINCT lang FROM obs) l
       |  LEFT JOIN obs ON obs.split = s.split AND obs.lang = l.lang),
       |marg AS (
       |  SELECT split, lang, o,
       |    SUM(o) OVER (PARTITION BY split) AS r,
       |    SUM(o) OVER (PARTITION BY lang) AS c,
       |    SUM(o) OVER () AS nn
       |  FROM cells)
       |SELECT CAST(COUNT(DISTINCT split) AS BIGINT) AS n_splits,
       |  CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       |  CAST(MAX(nn) AS BIGINT) AS n_docs,
       |  CAST(SUM(CAST(ROUND(${graft.ops.StatTests.Chi2Term}, 9)
       |    AS DECIMAL(28,9))) AS DECIMAL(38,9)) AS chi2,
       |  CAST((COUNT(DISTINCT split) - 1) * (COUNT(DISTINCT lang) - 1)
       |    AS BIGINT) AS df
       |FROM marg""".stripMargin
}

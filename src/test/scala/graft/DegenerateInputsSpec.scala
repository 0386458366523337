package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Systematic degenerate-input sweep across the KPI and sketch surface
  * (r6 verdict, next-round #8): empty tables, all-NULL measure columns,
  * single-row tables, and a current month with zero snapshot rows, driven
  * through the REGISTERED queries (the same entry points the driver gate
  * runs).  The pinned contract per input class:
  *
  *   - no query throws (degenerate data is an operational reality —
  *     a fresh tenant, a table mid-backfill, a dead month);
  *   - the output SCHEMA is identical to the healthy-input schema (a
  *     downstream consumer's contract does not change because a month is
  *     empty);
  *   - empty input ⇒ empty output for grouped queries (no phantom
  *     groups), and ≤1 all-degenerate row for global aggregates.
  */
class DegenerateInputsSpec extends SparkSpec {

  // Every table the KPI + sketch + heavy-hitter queries read.  `events`
  // passes through RAW (ts stays a nanos LONG, the layout Sources.events
  // expects to find in a dir).
  private val tables = Seq("lineitem", "orders", "customer", "nation",
    "supplier", "part", "region", "events", "documents", "embeddings")

  private def stage(tag: String)(xf: (String, DataFrame) => DataFrame): String = {
    val dir = Files.createTempDirectory(s"graft_degen_$tag").toString
    tables.foreach { t =>
      val raw = graft.core.Sources.table(spark, Sf001, t)
      xf(t, raw).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  private def nullify(df: DataFrame, cols: String*): DataFrame =
    cols.foldLeft(df)((d, c) =>
      d.withColumn(c, lit(null).cast(d.schema(c).dataType)))

  private lazy val emptyDir = stage("empty")((_, df) => df.limit(0))

  private lazy val nullMeasureDir = stage("nulls") {
    case ("lineitem", df) =>
      nullify(df, "l_extendedprice", "l_quantity", "l_discount")
    case ("orders", df) => nullify(df, "o_totalprice")
    case ("events", df) => nullify(df, "value")
    case ("customer", df) => nullify(df, "c_acctbal")
    case (_, df) => df
  }

  private lazy val singleRowDir = stage("single")((_, df) => df.limit(1))

  // The anchor month (2001-08, the P6 target) AND the month before it
  // (2001-07, the P5 target) stripped from orders: each pipeline's
  // snapshot logic (MAX order day per month) finds a month with zero
  // snapshots.
  private lazy val deadMonthDir = stage("deadmonth") {
    case ("orders", df) => df.filter(col("o_orderdate") < lit("2001-07-01"))
    case (_, df) => df
  }

  private val kpiQueries = Seq(
    "q_p1_receita_farmer", "q_p2_receita_presente", "q_p3_receita_cliente",
    "q_p4_receita_produto", "q_p5_fechamento_passado", "q_p5_fechamento_range",
    "q_p6_fechamento_presente", "q_p6_fechamento_periodo_array")

  private val sketchQueries = Seq(
    "q_an_quantile_sketch", "q_an_quantile_sketch_capped", "q_an_mad_sketch",
    "q_an_histogram_eqdepth_sketch", "q_an_outliers_sketch", "q_an_hll_sketch",
    "q_an_heavy_hitters")

  // The round-7 additions: statistics with division/saturation regimes
  // (ab_test's empty-arm guard lives or dies here), iterative codebooks
  // on tiny corpora, and per-key window walks.
  private val round7Queries = Seq(
    "q_text_tfidf", "q_text_drift", "q_an_ab_test", "q_an_rolling_var",
    "q_ops_scd2", "q_stream_trending", "q_ann_pq",
    // Late round-7 additions: the iterative graph loop on an empty edge
    // set, the salted join against a non-empty literal dim, attribution
    // and cohort math over zero users, the hopping window.
    "q_an_pagerank", "q_ops_salted_join", "q_an_first_touch",
    "q_an_cohort_ltv", "q_stream_sliding",
    // Session additions: the KMV pair stage (element_at on an empty
    // union array), the CDC diff's full-outer classification with an
    // empty before-state, and the asymmetric prefix filter on an
    // empty/degenerate corpus.
    "q_an_kmv_set_ops", "q_ops_snapshot_diff", "q_dedup_containment",
    // The sweep-line's global window over an empty cell table, the CMS
    // probe join with zero probes, and the deletion index over an
    // empty/singleton key set.
    "q_an_concurrency", "q_an_cms_freq", "q_ops_fuzzy_keys",
    // The sketch-boundary scoring crossJoin over zero customers, BM25's
    // posting window over an empty match set, and the trailing anomaly
    // window with fewer than 8 observed days everywhere.
    "q_an_rfm", "q_text_search", "q_an_anomaly_days",
    // The largest-remainder explode over zero purchases and the
    // incremental rollup's max() watermark over an empty corpus.
    "q_an_linear_touch", "q_ops_incremental_agg",
    // Lag windows over sub-8-day series and the first-day split with
    // zero users.
    "q_an_forecast_backtest", "q_an_new_vs_returning",
    // The streamed-cells scoring path over an empty/short corpus.
    "q_stream_anomaly",
    // The bigram df window over an empty/1-token-only corpus.
    "q_text_novelty",
    // Digest sums over empty groups and the LEAD weights on empty/
    // single-event series.
    "q_ops_table_digest", "q_an_twap",
    // The decile broadcast over zero users and the 9-way CASE over an
    // empty digit table.
    "q_an_gains_curve", "q_an_benford",
    // Epoch-grid and audit paths over empty inputs.
    "q_an_heatmap", "q_ops_surrogate_keys",
    // The zero-variance NULLIF denominator on degenerate series.
    "q_an_autocorr",
    // Continuation additions: the grid inner product with zero cells on
    // either side, Σc²/T² with a zero or single-customer month, sketch
    // fences over empty groups, the LM join over a bigram-free corpus,
    // the Expand melt of an empty pivot, and the KMV sampler over
    // empty/singleton strata.
    "q_an_cms_join_size", "q_an_hhi", "q_an_trimmed_mean",
    "q_text_lm_score", "q_ops_unpivot", "q_llm_sample_kmv",
    // r7 ADVICE #3: rake's explode/doc-window path over an empty corpus
    // and runs_test's NULLIF guards over empty/all-zero-delta events.
    "q_text_rake", "q_an_runs_test",
    // Round-8 additions with division-bearing aggregates over empty or
    // all-degenerate corpora.
    "q_llm_sample_by_quality",
    // Round-8 continuation: the sqrt-chain totals over an empty corpus,
    // the greatest-floored readability denominators, the per-type
    // explode/rollup on empty text, and the aggregate() fold over the
    // single-''-token list.
    "q_llm_mixture_temperature", "q_text_readability", "q_text_lexical",
    "q_llm_quality_classifier",
    // Batch 2: the per-month rank window over zero customers, the pair
    // explode over an empty vocabulary, the banding/split matrix over an
    // empty corpus, and the sentence df floor with zero sentences.
    "q_an_gini", "q_llm_bpe_pairs", "q_llm_split_leakage",
    "q_text_boilerplate",
    // The DPP staging short-circuit on a data-file-less source and the
    // NULLIF precision/recall row over zero pairs.
    "q_ops_dpp", "q_dedup_lsh_eval",
    // The sub-window fingerprint CASE on tiny docs, the NULLIF rank
    // denominator on 1-day series, and the empty contingency grid.
    "q_text_winnowing", "q_an_spearman", "q_an_chi2",
    // Two-sample tests over empty / single-sample day cells (NULLIF
    // denominators on both).
    "q_an_ks_weekend", "q_an_mann_whitney",
    // Evaluation harnesses over empty truth sets (NULLIF recall) and an
    // empty prediction grid.
    "q_ann_recall", "q_text_langid_eval",
    // The bin histogram over zero pairs, source joins over an empty pair
    // set, and ANOVA's NULLIF df/SS denominators on degenerate series.
    "q_dedup_threshold_sweep", "q_dedup_source_matrix", "q_an_anova_dow",
    // The ordered fold over empty/1-day series and the per-config pair
    // joins over an empty signature table.
    "q_an_ewma", "q_dedup_band_tuning",
    // Variance/ratio chains over single-day series and the LAG base
    // NULLIF on a 0/1-month calendar.
    "q_an_dispersion", "q_an_mom_growth",
    // Batch 3: pair frames over empty day cells (kendall's NULLIF tau,
    // theil-sen's empty median walk), line dedup's explode/string_agg
    // over an empty corpus, both sessionization shapes over empty
    // events, centroid/norm audits over empty embeddings, the fertility
    // and zipf NULLIF chains, the burstiness top-K over an empty
    // vocabulary, and the dense split grid with zero docs.
    "q_an_kendall", "q_an_theil_sen", "q_dedup_lines",
    "q_ops_sessionize_batch", "q_an_gap_histogram",
    "q_llm_label_centroids", "q_llm_embedding_stats", "q_text_fertility",
    "q_text_zipf", "q_text_burstiness", "q_llm_split_balance",
    "q_ops_key_skew",
    // Round-9: rank tests over empty/one-day cells (NULLIF H, empty
    // pair frames), the κ division over an all-NULL 1-row grid, the
    // OOV join against an empty vocabulary, the sqrt/NULLIF chain on
    // the empty contingency grid, and the TxLog empty-snapshot
    // short-circuit (the q_ops_dpp shape).
    "q_an_kruskal", "q_an_wilcoxon", "q_text_kappa", "q_an_cramers_v",
    "q_llm_vocab_coverage", "q_ops_txlog",
    // Friedman's complete-block filter over a corpus with no complete
    // weeks, and the time-travel guard on a sub-2-version log.
    "q_an_friedman", "q_ops_txlog_asof",
    // Pettitt's cumulative-U windows over empty/single-day series, and
    // the seasonal index's 1-row totals broadcast over zero months.
    "q_an_pettitt", "q_an_seasonal_index",
    // Kaplan-Meier's risk-set windows and ordered product fold over
    // empty/single-user lifetimes (all-censored corpus).
    "q_an_kaplan_meier",
    // Round-9 continuation: every TxLog verb gate over an empty/
    // degenerate staged log (merge of an empty batch, CDF over
    // meta-only commits, restore/replace of empty generations — each
    // guarded by the empty-snapshot short-circuit), the paired-test
    // NULLIF on an all-concordant or empty corpus, the SQ8 scale agg
    // over zero embeddings (empty collect_list array), recall NULLIFs
    // over empty truth sets, the greedy loops (kcenter/mmr) with no
    // seed / no pool, and the cross-corr pair join over empty or
    // single-type day cells.
    "q_ops_txlog_incr", "q_ops_txlog_merge", "q_ops_txlog_cdf",
    "q_ops_txlog_restore", "q_ops_txlog_replace", "q_text_mcnemar",
    "q_ann_sq8", "q_ann_sq8_recall", "q_llm_kcenter", "q_ann_mmr",
    "q_ann_matryoshka", "q_an_cross_corr", "q_ann_hard_negatives",
    "q_an_nelson_aalen", "q_an_logrank")

  private val sweep = kpiQueries ++ sketchQueries ++ round7Queries

  /** Healthy-input schemas, the contract every degenerate run must keep. */
  private lazy val healthySchemas: Map[String, Seq[(String, String)]] =
    sweep.map { name =>
      name -> SparkEntry.queries(name)(spark, Sf001).schema.fields.toSeq
        .map(f => (f.name, f.dataType.simpleString))
    }.toMap

  private def run(name: String, dir: String) = {
    val df = SparkEntry.queries(name)(spark, dir)
    (df.schema.fields.toSeq.map(f => (f.name, f.dataType.simpleString)),
      df.collect())
  }

  test("empty tables: no throw, stable schema, no phantom groups") {
    sweep.foreach { name =>
      val (schema, rows) = run(name, emptyDir)
      assert(schema == healthySchemas(name), s"$name schema drifted on empty")
      // Global aggregates legitimately emit one all-degenerate row
      // (SQL semantics: agg over zero rows); grouped queries must not
      // invent groups.  band_tuning is a UNION of one global aggregate
      // PER CONFIGURATION (3 bandings) and key_skew one PER AUDITED
      // RELATION (2), so their empty shapes are exactly those counts —
      // pinned here rather than exempted.
      val cap = name match {
        case "q_dedup_band_tuning" => 3
        case "q_ops_key_skew" => 2
        case _ => 1
      }
      assert(rows.length <= cap, s"$name emitted ${rows.length} rows on empty")
      if (name == "q_dedup_band_tuning")
        rows.foreach(r => assert(r.getLong(2) == 0L,
          s"$name invented candidate pairs on empty"))
    }
  }

  test("all-NULL measure columns: no throw, stable schema") {
    sweep.foreach { name =>
      val (schema, _) = run(name, nullMeasureDir)
      assert(schema == healthySchemas(name), s"$name schema drifted on nulls")
    }
  }

  test("single-row tables: no throw, stable schema") {
    sweep.foreach { name =>
      val (schema, _) = run(name, singleRowDir)
      assert(schema == healthySchemas(name),
        s"$name schema drifted on single-row")
    }
  }

  test("a month with zero snapshots: fechamento family stays sane") {
    // Designed semantics (the reference's closing report likewise lists
    // every farmer): a month with no sales still emits one row per
    // farmer — zero revenue is a statement, a missing farmer is a bug.
    // What must NOT happen: a responsibility period claiming a sale day
    // that never existed.
    Seq("q_p5_fechamento_passado", "q_p6_fechamento_presente",
      "q_p6_fechamento_periodo_array").foreach { name =>
      val (schema, rows) = run(name, deadMonthDir)
      assert(schema == healthySchemas(name), s"$name schema drifted")
      val healthyCount = SparkEntry.queries(name)(spark, Sf001).count()
      assert(rows.length.toLong == healthyCount,
        s"$name must keep one row per farmer on a dead month")
      val inicioIdx = schema.indexWhere(_._1 == "periodo_responsabilidade_inicio")
      if (inicioIdx >= 0) {
        assert(rows.forall(_.isNullAt(inicioIdx)),
          s"$name fabricated a first-sale day in a month with no sales")
      }
    }
  }

  test("sketch aggregates on empty and all-NULL input evaluate to NULL, not garbage") {
    import spark.implicits._
    graft.functions.QuantileSketch.register(spark)
    val empty = spark.emptyDataset[Long].toDF("v")
    val row = empty.selectExpr(
      "q_sketch(v, 0.5D, 64) AS a",
      "q_sketch_multi(v, array(0.25D, 0.75D), 64) AS b").head()
    assert(row.isNullAt(0) && row.isNullAt(1))
    val allNull = Seq[Option[Long]](None, None).toDF("v")
    val row2 = allNull.selectExpr(
      "q_sketch(v, 0.5D, 64) AS a",
      "q_sketch_multi(v, array(0.25D, 0.75D), 64) AS b").head()
    assert(row2.isNullAt(0) && row2.isNullAt(1))
    // Mixed: nulls are skipped, the surviving value is the answer.
    val mixed = Seq[Option[Long]](None, Some(42L), None).toDF("v")
    val row3 = mixed.selectExpr(
      "q_sketch(v, 0.5D, 64) AS a",
      "q_sketch_multi(v, array(0.25D, 0.75D), 64) AS b").head()
    assert(row3.getLong(0) == 42L)
    assert(row3.getSeq[Long](1) == Seq(42L, 42L))
  }

  test("expectations report: full constraint list even on degenerate input") {
    // A quality REPORT is the one query whose empty-input contract is NOT
    // an empty result: every declared constraint must still report (all
    // green — zero rows have zero violations), so a monitoring consumer
    // can distinguish "table empty" from "checks didn't run".
    Seq(emptyDir, singleRowDir, nullMeasureDir).foreach { dir =>
      val rows = SparkEntry.queries("q_ops_expectations")(spark, dir)
        .collect()
      assert(rows.length === 7, s"report must stay complete ($dir)")
    }
    val onEmpty = SparkEntry.queries("q_ops_expectations")(spark, emptyDir)
      .collect()
    assert(onEmpty.forall(_.getBoolean(2)), "zero rows ⇒ zero violations")
  }
}

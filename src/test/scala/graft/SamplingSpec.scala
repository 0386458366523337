package graft

import org.apache.spark.sql.functions._

import graft.llm.Sampling

class SamplingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("splits are disjoint, exhaustive, and a pure function of doc_id") {
    val s = Sampling.splits(spark, dir).cache()
    try {
      val total = s.count()
      assert(total == graft.core.Sources.documents(spark, dir).count())
      // One split per doc (disjoint+exhaustive), and re-evaluation under a
      // different partitioning assigns identically (no RNG anywhere).
      val again = Sampling.splits(spark, dir).repartition(13)
        .withColumnRenamed("split", "split2").select("doc_id", "split2")
      val disagree = s.join(again, "doc_id")
        .filter(col("split") =!= col("split2")).count()
      assert(disagree == 0)
      val bad = s.filter(!col("split").isin("train", "val", "test")).count()
      assert(bad == 0)
    } finally s.unpersist()
  }

  test("split shares land near the configured percentages") {
    val s = Sampling.splits(spark, dir, valPct = 10, testPct = 10)
    val byShare = s.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = byShare.values.sum.toDouble
    // mix31 buckets are uniform; 500 docs → generous ±60% relative band.
    assert(math.abs(byShare("train") / total - 0.8) < 0.1)
    assert(byShare("val") > 0 && byShare("test") > 0)
  }

  test("raising a language's rate keeps the smaller sample nested") {
    val lo = Sampling.stratifiedSample(spark, dir,
      Seq("en" -> 2000, "zh" -> 2000, "de" -> 2000, "fr" -> 2000,
        "es" -> 2000))
    val hi = Sampling.stratifiedSample(spark, dir,
      Seq("en" -> 8000, "zh" -> 8000, "de" -> 8000, "fr" -> 8000,
        "es" -> 8000))
    val loN = lo.agg(sum("sampled_docs")).collect().head.getLong(0)
    val hiN = hi.agg(sum("sampled_docs")).collect().head.getLong(0)
    // Nested by construction (same hash, bigger threshold) — so the kept
    // count is monotone in the rate.
    assert(loN < hiN)
  }

  test("mixture weights move the mixture exactly onto the target") {
    val m = Sampling.mixtureWeights(spark, dir).collect()
    assert(m.length == Sampling.DefaultTargets.length)
    m.foreach { r =>
      val w = r.getAs[Double]("mix_weight")
      val share = r.getAs[Double]("actual_share")
      val target = r.getAs[Int]("target_bp") / 10000.0
      // By construction weight * actual_share = target share (one IEEE
      // division apart).
      assert(math.abs(w * share - target) < 1e-12, s"$r")
      assert(w > 0.0)
    }
    // Shares partition the corpus.
    assert(math.abs(m.map(_.getAs[Double]("actual_share")).sum - 1.0) < 1e-9)
    // The dominant language (en) must be down-weighted under uniform targets.
    val en = m.find(_.getAs[String]("lang") == "en").get
    assert(en.getAs[Double]("mix_weight") < 1.0)
  }

  test("observed rate tracks the target rate per language") {
    val rows = Sampling.stratifiedSample(spark, dir).collect()
    rows.foreach { r =>
      val target = r.getAs[Int]("rate_bp").toDouble
      val obs = r.getAs[Double]("observed_bp")
      // Small strata (60-220 docs at sf0.001): ±2500bp absolute band.
      assert(math.abs(obs - target) < 2500, s"$r")
    }
  }

  test("resamplePlan hits the mixture weight within sampling resolution") {
    val rows = Sampling.resamplePlan(spark, dir).collect()
    val weights = Sampling.mixtureWeights(spark, dir).collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Double]("mix_weight"))
      .toMap
    rows.foreach { r =>
      val lang = r.getAs[String]("lang")
      val n = r.getAs[Long]("n_docs")
      val eff = r.getAs[Long]("effective_docs")
      val w = weights(lang)
      // floor(w) epochs are exact; the fractional tail is a mix31 sample,
      // so effective/n tracks w within the small-stratum band plus the
      // 1bp floor truncation.
      assert(eff >= r.getAs[Long]("epochs_full") * n)
      assert(math.abs(eff.toDouble / n - w) < 0.35, s"$lang eff=$eff n=$n w=$w")
    }
  }

  test("shuffleOrder is a sharded permutation with contiguous positions") {
    val rows = Sampling.shuffleOrder(spark, dir, nShards = 4).collect()
    val docs = graft.core.Sources.documents(spark, dir).count()
    assert(rows.length.toLong == docs, "every doc gets a slot")
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == rows.length)
    rows.groupBy(_.getAs[Int]("shard")).foreach { case (_, part) =>
      // Positions are exactly 0..n-1 within the shard and follow the
      // (skey, doc_id) order — the reader contract.
      val sorted = part.sortBy(r =>
        (r.getAs[Long]("skey"), r.getAs[Long]("doc_id")))
      assert(sorted.map(_.getAs[Long]("pos")).toSeq ===
        (0L until part.length.toLong))
      // skey is the engine-wide mix31 of the id — replayable anywhere.
      sorted.foreach { r =>
        assert(r.getAs[Long]("skey") ==
          graft.functions.Mix31.mix(r.getAs[Long]("doc_id")))
      }
    }
  }

  test("sampleKmv draws exactly min(k, n) docs per language, bottom-k by hash") {
    val k = 7
    val got = Sampling.sampleKmv(spark, dir, k = k).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val all = graft.core.Sources.documents(spark, dir)
      .selectExpr("lang", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // Brute force: the k smallest mix31 hashes per language.
    val want = all.groupBy(_._1).toSeq.flatMap { case (lang, docs) =>
      docs.map(_._2).sortBy(graft.functions.Mix31.mix)
        .take(k).map(lang -> _).toSeq
    }.toSet
    assert(got.toSet === want)
    got.groupBy(_._1).foreach { case (lang, xs) =>
      val n = all.count(_._1 == lang)
      assert(xs.length === math.min(k, n), s"lang $lang")
    }
    // Determinism: a rerun draws the identical sample.
    val again = Sampling.sampleKmv(spark, dir, k = k).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(again === got.toSet)
  }

  test("quality-banded sampling: rulebook bands land where designed") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("qsample").toString
    val natural = "the quick brown fox, jumps over the lazy dog. " +
      "and then a second sentence follows: with more words of text to " +
      "clear the length gate!" // stopwords + ≥3 punct + ≥15 diverse tokens
    val repetitive = ("spam ham " * 20).trim          // diversity 2/40 → low
    val short_ = "tiny doc"                           // <15 tokens → low
    val plain = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho"          // no stopwords → mid
    Seq((1L, natural, "en", "a", 1L), (2L, repetitive, "en", "a", 1L),
      (3L, short_, "en", "a", 1L), (4L, plain, "en", "a", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val bands = Sampling.sampleByQuality(spark, dir).collect()
      .map(r => r.getString(1) -> (r.getInt(2), r.getLong(3))).toMap
    assert(bands("high") == ((10000, 1L))) // natural prose, kept at 100%
    assert(bands("low") == ((500, 2L)))    // short + repetitive
    assert(bands("mid") == ((5000, 1L)))
    // A high-band doc at rate 10000 bp is always kept.
    val kept = Sampling.sampleByQuality(spark, dir)
      .filter(col("band") === "high").head
    assert(kept.getLong(4) == 1L) // sampled_docs
  }

  test("temperature mixture: exact sqrt-chain weights, flattening shares") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("tmix").toString
    // en: 64 tokens, de: 4 tokens → weights 64/8/2 vs 4/2/1 by α=1,½,¼.
    Seq((1L, Seq.fill(64)("w").mkString(" "), "en", "a", 1L),
      (2L, "w w w w", "de", "a", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val m = Sampling.temperatureMixture(spark, tmp).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(m("en").getLong(1) == 64L && m("en").getLong(2) == 8L
      && m("en").getLong(3) == 2L)
    assert(m("de").getLong(1) == 4L && m("de").getLong(2) == 2L
      && m("de").getLong(3) == 1L)
    assert(m("en").getDouble(4) == math.rint(64.0 / 68 * 1e6) / 1e6)
    assert(m("en").getDouble(5) == 0.8)                      // 8/10
    assert(m("en").getDouble(6) == math.rint(2.0 / 3 * 1e6) / 1e6)
    // Lower temperature flattens: dominant share strictly decreases,
    // scarce share strictly increases.
    assert(m("en").getDouble(4) > m("en").getDouble(5))
    assert(m("en").getDouble(5) > m("en").getDouble(6))
    assert(m("de").getDouble(4) < m("de").getDouble(5))
    assert(m("de").getDouble(5) < m("de").getDouble(6))
  }

  test("temperature mixture shares each sum to ~1 on the real corpus") {
    val rows = Sampling.temperatureMixture(spark, dir).collect()
    assert(rows.nonEmpty)
    Seq(4, 5, 6).foreach { i =>
      val s = rows.map(_.getDouble(i)).sum
      assert(math.abs(s - 1.0) < 1e-4, s"share column $i sums to $s")
    }
    // floor(sqrt) chain really is the integer fourth root.
    rows.foreach { r =>
      val (n, w05, w025) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(w05 == math.sqrt(n.toDouble).toLong)
      assert(w025 == math.sqrt(w05.toDouble).toLong)
    }
  }

  test("split balance: chi2 recomputes from the dense split x lang grid") {
    val r = Sampling.splitBalance(spark, Sf001).collect().head
    val cells = Sampling.splits(spark, Sf001)
      .groupBy("split", "lang").count().collect()
      .map(x => (x.getString(0), x.getString(1)) -> x.getLong(2)).toMap
    val splits = cells.keys.map(_._1).toSeq.distinct
    val langs = cells.keys.map(_._2).toSeq.distinct
    val rowT = splits.map(s => s -> langs.map(l =>
      cells.getOrElse((s, l), 0L)).sum).toMap
    val colT = langs.map(l => l -> splits.map(s =>
      cells.getOrElse((s, l), 0L)).sum).toMap
    val n = rowT.values.sum
    val want = (for { s <- splits; l <- langs } yield {
      val o = cells.getOrElse((s, l), 0L).toDouble
      val e = rowT(s).toDouble * colT(l) / n
      BigDecimal(math.rint((o - e) * (o - e) / e * 1e9) / 1e9)
    }).sum
    assert(r.getLong(0) == splits.length.toLong)
    assert(r.getLong(1) == langs.length.toLong)
    assert(r.getLong(2) == n)
    assert(BigDecimal(r.getDecimal(3)) == want)
    assert(r.getLong(4) == (splits.length - 1).toLong * (langs.length - 1))
  }
}

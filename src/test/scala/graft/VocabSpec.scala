package graft

import org.apache.spark.sql.functions._

import graft.llm.Vocab

class VocabSpec extends SparkSpec {
  import spark.implicits._

  test("top-K vocab is ranked, contiguous, and coverage-monotone") {
    val v = Vocab.topK(spark, Sf001, k = 20).cache()
    try {
      val rows = v.orderBy($"rank").collect()
      assert(rows.length == 20)
      assert(rows.map(_.getAs[Int]("rank")).toSeq == (1 to 20))
      val cnts = rows.map(_.getAs[Long]("cnt"))
      assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b },
        "counts must be non-increasing down the ranking")
      val cov = rows.map(_.getAs[Double]("coverage"))
      assert(cov.zip(cov.tail).forall { case (a, b) => a <= b })
      assert(cov.last <= 1.0 && cov.head > 0.0)
      // cum_tokens really is the running sum of cnt.
      val cum = rows.map(_.getAs[Long]("cum_tokens"))
      assert(cum.toSeq == cnts.scanLeft(0L)(_ + _).tail.toSeq)
    } finally v.unpersist()
  }

  test("a K beyond the vocabulary returns the whole vocabulary, coverage 1") {
    // The synthetic corpus has a ~31-word vocabulary: K larger than that
    // must clamp (LIMIT semantics, identical in both engines) and the last
    // row's running coverage must close at exactly 1.0 — the integer
    // running sum equals the integer total, so the division is exact.
    val v = Vocab.topK(spark, Sf001, k = 10000)
      .orderBy($"rank".desc).cache()
    try {
      val vocabSize = graft.core.Sources.documents(spark, Sf001)
        .select(explode(split($"text", " ")).as("word"))
        .distinct().count()
      assert(v.count() == vocabSize)
      assert(v.head().getAs[Double]("coverage") == 1.0)
    } finally v.unpersist()
  }

  test("rank 1 is the corpus's true most frequent token") {
    val naive = graft.core.Sources.documents(spark, Sf001)
      .select(explode(split($"text", " ")).as("word"))
      .groupBy("word").count()
      .orderBy($"count".desc, $"word".asc).head()
    val top = Vocab.topK(spark, Sf001, k = 1).head()
    assert(top.getAs[String]("word") == naive.getAs[String]("word"))
    assert(top.getAs[Long]("cnt") == naive.getAs[Long]("count"))
  }

  test("heavyHitters raises when a lang's vocabulary reaches k (exact-regime guard)") {
    // k far below the ~30-token-per-lang synthetic vocabulary: the sketch
    // would fill its counters and est_count would silently turn
    // approximate while the oracle stays exact (r6 ADVICE #5) — the
    // in-plan assert must fail the query loudly instead.
    val e = intercept[Exception] {
      Vocab.heavyHitters(spark, Sf001, k = 4).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("exact regime")))
    // The registered k = 64 stays comfortably above it — still green.
    assert(Vocab.heavyHitters(spark, Sf001).count() > 0)
  }

  test("bpe pairs: corpus-weighted adjacent-char counts, hand-computed") {
    val dir = java.nio.file.Files.createTempDirectory("bpe").toString
    // Vocabulary {ab (freq 3), abc (freq 1), x (freq 1)}:
    //   'ab' ← 3 (from ab) + 1 (from abc) = 4; 'bc' ← 1; 'x' too short.
    Seq((1L, "ab ab x", "en", "a", 1L), (2L, "ab abc", "en", "a", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Vocab.bpePairs(spark, dir, k = 10).collect()
      .map(r => r.getString(1) -> ((r.getInt(0), r.getLong(2)))).toMap
    assert(rows == Map("ab" -> ((1, 4L)), "bc" -> ((2, 1L))))
  }

  test("bpe pairs on the real corpus: ranked, every pair is two chars") {
    val rows = Vocab.bpePairs(spark, Sf001, k = 20).collect()
    assert(rows.length == 20)
    assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to 20))
    rows.foreach { r =>
      assert(r.getAs[String]("pair").length == 2)
      assert(r.getAs[Long]("cnt") >= 1L)
    }
    val byRank = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("cnt"))
    assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
  }

  test("bigram LM tables satisfy the probability-model invariants") {
    val rows = Vocab.bigramLm(spark, Sf001).collect()
    val byW1 = rows.groupBy(_.getAs[String]("w1"))
    byW1.foreach { case (w1, rs) =>
      val ctx = rs.head.getAs[Long]("c_context")
      // c(w1) = Σ_w2 c(w1, w2), and every row of the context agrees.
      assert(rs.map(_.getAs[Long]("c_bigram")).sum === ctx, w1)
      assert(rs.forall(_.getAs[Long]("c_context") == ctx))
      // Continuation fan-out counts exactly the distinct successors.
      assert(rs.head.getAs[Long]("n_continuations") === rs.length.toLong)
      assert(rs.map(_.getAs[String]("w2")).distinct.length === rs.length)
      // Conditional probabilities sum to 1 per context.
      assert(math.abs(rs.map(_.getAs[Double]("p_ml")).sum - 1.0) < 1e-9, w1)
    }
    // Global mass: Σ c(w1, w2) over all rows = corpus bigram count.
    val corpusBigrams = graft.core.Sources.documents(spark, Sf001)
      .selectExpr("greatest(size(split(text, ' ')) - 1, 0) AS n")
      .agg(org.apache.spark.sql.functions.sum($"n")).head().getLong(0)
    assert(rows.map(_.getAs[Long]("c_bigram")).sum === corpusBigrams)
  }

  test("fuzzy vocab's length band loses no pair vs brute-force all-pairs") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val vocab = graft.core.Sources.documents(spark, Sf001)
      .select(explode(split($"text", " ")).as("t")).distinct()
      .collect().map(_.getString(0)).sorted
    val want = (for {
      a <- vocab; b <- vocab if a < b
      d = lev(a, b) if d <= 2
    } yield (a, b, d)).toSet
    val got = Vocab.fuzzyVocab(spark, Sf001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(got === want)
  }

  test("zipf fit: an exact 1/rank frequency head scores slope -1, r2 1") {
    val dir = java.nio.file.Files.createTempDirectory("zipf").toString
    // Counts 12/rank: 12, 6, 4, 3 — ln(cnt) = ln 12 − ln(rank) exactly.
    val text = (Seq.fill(12)("a") ++ Seq.fill(6)("b") ++ Seq.fill(4)("c")
      ++ Seq.fill(3)("d")).mkString(" ")
    Seq((1L, text, "en", "s", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = Vocab.zipfFit(spark, dir).collect().head
    assert(r.getLong(0) == 4L)
    assert(r.getDouble(1) == -1.0)
    assert(r.getDouble(2) == 2.484907) // ln 12 at ROUND-6
    assert(r.getDouble(3) == 1.0)
  }

  test("zipf fit is sane on the real corpus: negative slope, r2 in [0,1]") {
    val r = Vocab.zipfFit(spark, Sf001).collect().head
    assert(r.getLong(0) >= 2L)
    assert(r.getDouble(1) < 0.0)
    assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0 + 1e-9)
  }

  test("vocab coverage: hand-computed per-language OOV against top-1") {
    import spark.implicits._
    // Counts: a=3, b=1, c=1 → top-1 vocabulary = {a}.
    // en: 3 tokens, 1 OOV (b) → 1/3; es: 2 tokens, 1 OOV (c) → 1/2.
    val dir = java.nio.file.Files.createTempDirectory("vcov").toString
    Seq((1L, "a a b", "en"), (2L, "a c", "es"))
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Vocab.vocabCoverage(spark, dir, k = 1).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got("en") == ((3L, 1L, math.rint(1.0 / 3.0 * 1e6) / 1e6)))
    assert(got("es") == ((2L, 1L, 0.5)))
  }

  test("vocab coverage: a full vocabulary drives every OOV rate to zero") {
    val rows = Vocab.vocabCoverage(spark, Sf001, k = 1000000).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) == 0L && r.getDouble(3) == 0.0)
    }
  }

  test("lmScoreBounded: k beyond the vocabulary degenerates to lmScore; small k buckets OOV") {
    // The synthetic corpus has a ~31-word vocabulary, so k=4096 closes
    // over everything: the bounded twin must equal the unbounded score
    // exactly (same counts, same divisions, same rounding).
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id", $"n_bigrams", $"sum_p".cast("string"), $"lm_score")
        .as[(Long, Long, String, Double)].collect().sortBy(_._1).toSeq
    val full = rows(Vocab.lmScore(spark, Sf001))
    val bounded = rows(Vocab.lmScoreBounded(spark, Sf001))
    assert(bounded == full)
    // A 5-type vocabulary forces real <unk> mass: every doc still scores,
    // bigram counts are conserved, and scores stay in (0, 1].
    val tiny = Vocab.lmScoreBounded(spark, Sf001, k = 5)
      .as[(Long, Long, java.math.BigDecimal, Double)].collect()
    assert(tiny.length == full.length)
    assert(tiny.map(_._2).sum == full.map(_._2).sum,
      "bucketing must not create or destroy bigrams")
    assert(tiny.forall(t => t._4 > 0.0 && t._4 <= 1.0))
    // Bucketing coarsens contexts, so scores genuinely move for some doc
    // (if they didn't, the tiny-k path silently wasn't exercising <unk>).
    assert(tiny.sortBy(_._1).map(_._4).toSeq != full.map(_._4))
  }

  test("bpeTrain enforces the 64-symbol word bound (r10 ADVICE: 5-pass merge fixpoint)") {
    // A word with >= 64 symbols may not reach the replace fixpoint in
    // 5 passes; both engines would be identically under-merged, so the
    // bound is enforced loudly instead of shipping a wrong tokenization.
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe_bound")
      .toString
    val longWord = "ab" * 40 // 80 symbols
    Seq((1L, s"hello $longWord world", "en", "synthetic", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(dir + "/documents.parquet")
    val e = intercept[IllegalArgumentException] {
      Vocab.bpeMerges(spark, dir, rounds = 2).collect()
    }
    assert(e.getMessage.contains("64 symbols"))
    // And the gate corpus itself is inside the bound (so the gate
    // fixtures can never regress into the unenforced zone silently).
    assert(Vocab.bpeMerges(spark, Sf001, rounds = 1).count() == 1)
  }

  test("bpeMerges: rounds are complete, counts non-increasing, round 1 = bpePairs top-1") {
    val m = Vocab.bpeMerges(spark, Sf001, rounds = 6).collect()
    assert(m.map(_.getAs[Int]("round")).toSeq == (1 to 6))
    val cnts = m.map(_.getAs[Long]("cnt"))
    // Merging (l,r) can only shrink other pairs' counts, and a pair it
    // creates, (x, lr) or (lr, y), counts (x,l,r)/(l,r,y) triples ≤
    // cnt(l,r) — so the chosen max is non-increasing across rounds.
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b })
    m.foreach(r => assert(r.getAs[String]("merged") ==
      r.getAs[String]("pair_l") + r.getAs[String]("pair_r")))
    // Round 1 is exactly bpePairs' (character-pair) argmax.
    val first = Vocab.bpePairs(spark, Sf001, k = 1)
      .head().getAs[String]("pair")
    assert(m.head.getAs[String]("merged") == first)
  }

  test("bpeEncode: tokens bounded by words and chars; 0 rounds = char count; merges only shrink") {
    val enc = Vocab.bpeEncode(spark, Sf001).collect()
    assert(enc.nonEmpty)
    enc.foreach { r =>
      val (w, t, c) = (r.getAs[Long]("n_words"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_chars"))
      // Every word is at least one token; tokens never exceed the
      // doc's non-space chars (n_chars counts the w-1 joining spaces).
      assert(t >= w && t <= c - (w - 1))
      assert(r.getAs[Double]("chars_per_token") > 0.0)
    }
    // Zero merge rounds tokenizes every word into its characters.
    val enc0 = Vocab.bpeEncode(spark, Sf001, rounds = 0).collect()
    val t6 = enc.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("n_tokens")).toMap
    enc0.foreach { r =>
      val (w, t, c) = (r.getAs[Long]("n_words"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_chars"))
      assert(t == c - (w - 1))
      // Applying merges can only shrink a document's token count.
      assert(t6(r.getAs[Long]("doc_id")) <= t)
    }
  }

  test("bpeMerges mass conservation: each round shrinks total symbols by (0, cnt], losslessly") {
    val merges = Vocab.bpeMerges(spark, Sf001, rounds = 6).collect()
    // Re-derive the symbolization and re-apply each round's merge,
    // checking the trainer's invariants: every application removes
    // exactly one symbol per merged occurrence (so the corpus-weighted
    // symbol total drops by at most cnt, and by at least one), and
    // joining the symbols back always restores the original word.
    var words = graft.core.Sources.documents(spark, Sf001)
      .select(explode(split($"text", " ")).as("word"))
      .filter(length($"word") >= 2)
      .select($"word",
        concat(regexp_replace($"word", "(.)", "·$1"), lit("·")).as("s"))
      .groupBy($"word", $"s").agg(count(lit(1)).as("wcnt"))
      .cache()
    def totalSymbols(): Long = words
      .select(($"wcnt" *
        size(expr("filter(split(s, '·'), t -> t <> '')"))).as("n"))
      .agg(sum($"n")).head().getLong(0)
    def lossless(): Boolean = words
      .filter(regexp_replace($"s", "·", "") =!= $"word").isEmpty
    assert(lossless())
    for (row <- merges) {
      val before = totalSymbols()
      val pat = "·" + row.getAs[String]("pair_l") + "·" +
        row.getAs[String]("pair_r") + "·"
      val rep = "·" + row.getAs[String]("merged") + "·"
      val applied = (1 to 5)
        .foldLeft($"s": org.apache.spark.sql.Column)((c, _) =>
          call_function("replace", c, lit(pat), lit(rep)))
      words = words.select($"word", applied.as("s"), $"wcnt")
        .localCheckpoint()
      val after = totalSymbols()
      val shrunk = before - after
      assert(shrunk > 0L && shrunk <= row.getAs[Long]("cnt"),
        s"round ${row.getAs[Int]("round")}: shrunk $shrunk not in " +
          s"(0, ${row.getAs[Long]("cnt")}]")
      assert(lossless(), s"round ${row.getAs[Int]("round")} broke a word")
    }
  }
}

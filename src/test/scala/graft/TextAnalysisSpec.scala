package graft

import graft.llm.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("novelty: unique text scores 1, duplicated docs zero each other out") {
    import org.apache.spark.sql.functions._
    graft.functions.WordNgramShingles.register(spark)
    val out = TextAnalysis.noveltyOf(Seq(
      (1L, "alpha beta gamma delta"), // fully unique bigrams
      (2L, "red green blue"),         // duplicated below → novelty 0
      (3L, "red green blue"),
      (4L, "alpha beta sigma"),       // shares 'alpha beta' with doc 1
      (5L, "solo"))                   // 1 token: no bigram, absent
      .toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(out(1L) === ((3L, 2L, math.rint(2.0 / 3 * 1e6) / 1e6)))
    assert(out(2L) === ((2L, 0L, 0.0)))
    assert(out(3L) === ((2L, 0L, 0.0)))
    assert(out(4L) === ((2L, 1L, 0.5)))
    assert(!out.contains(5L))
  }

  test("readability: hand-computed FK grade and degenerate-text guards") {
    import org.apache.spark.sql.functions._
    val out = TextAnalysis.readabilityOf(Seq(
      (1L, "The cat sat. A dog ran!", "en"),
      (2L, "", "en")) // empty text: every denominator floored at 1
      .toDF("doc_id", "text", "lang"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    // 6 words, 2 sentence runs, 6 vowel groups → wps 3, spw 1,
    // fk = 0.39*3 + 11.8*1 - 15.59 = -2.62 → easy.
    assert(r1.getInt(2) == 6 && r1.getInt(3) == 2 && r1.getInt(4) == 6)
    assert(r1.getDouble(5) == 3.0 && r1.getDouble(6) == 1.0)
    assert(r1.getDouble(7) == -2.62 && r1.getString(8) == "easy")
    val r2 = out(2L)
    assert(!r2.anyNull) // finite everywhere, no NaN/NULL leaks
    assert(r2.getString(8) == "easy")
  }

  test("readability bands partition the real corpus") {
    val rows = TextAnalysis.readability(spark, Sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(Set("easy", "standard", "dense").contains(r.getString(8)))
      assert(!r.getDouble(7).isNaN)
    }
  }

  test("lexical diversity: TTR / Guiraud / Yule's K hand-computed") {
    import org.apache.spark.sql.functions._
    val out = TextAnalysis.lexicalDiversityOf(Seq(
      (1L, "a a b"),   // N=3 V=2 Σm²=5 → yule 10000*2/9
      (2L, "x y z"),   // all unique → yule 0
      (3L, "q q q q")) // one type → ttr 0.25, yule 10000*(16-4)/16
      .toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getLong(1) == 3L && r1.getLong(2) == 2L && r1.getLong(3) == 5L)
    assert(r1.getDouble(4) == math.rint(2.0 / 3 * 1e6) / 1e6)
    assert(r1.getDouble(5) == math.rint(2.0 / math.sqrt(3.0) * 1e6) / 1e6)
    assert(r1.getDouble(6) == math.rint(20000.0 / 9 * 1e6) / 1e6)
    assert(out(2L).getDouble(6) == 0.0)
    assert(out(3L).getDouble(4) == 0.25)
    assert(out(3L).getDouble(6) == 7500.0)
  }

  test("lexical diversity bounds hold corpus-wide") {
    val rows = TextAnalysis.lexicalDiversity(spark, Sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, v, m2) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(v >= 1 && v <= n)
      assert(m2 >= n && m2 <= n * n)
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0)
      assert(r.getDouble(6) >= 0.0)
    }
  }

  test("linear quality classifier: exact hashed logits, stable verdicts") {
    import org.apache.spark.sql.functions._
    val out = TextAnalysis.linearQualityScoreOf(Seq(
      (1L, "alpha", "en"),
      (2L, "alpha", "en"),           // identical text → identical logit
      (3L, "alpha alpha", "en"))     // doubled text → doubled logit
      .toDF("doc_id", "text", "lang"))
      .collect().map(r => r.getLong(0) -> r).toMap
    // End-to-end hash pin: md5 first-15-hex-chars % 2001 - 1000.
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest("alpha".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    val expected = java.lang.Long.parseLong(md5, 16) % 2001 - 1000
    assert(out(1L).getLong(3) == expected)
    assert(out(2L).getLong(3) == expected)
    assert(out(3L).getLong(3) == 2 * expected)
    val v = out(1L).getString(5)
    assert(v == (if (expected >= 0) "keep" else "drop"))
  }

  test("linear quality classifier bounds hold corpus-wide") {
    val rows = TextAnalysis.linearQualityScore(spark, Sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, logit) = (r.getInt(2).toLong, r.getLong(3))
      assert(math.abs(logit) <= 1000L * n)
      assert(math.abs(r.getDouble(4)) <= 1000.0)
      assert(r.getString(5) == (if (logit >= 0) "keep" else "drop"))
    }
    // Both verdicts occur on a natural corpus (weights are ±symmetric).
    val verdicts = rows.map(_.getString(5)).toSet
    assert(verdicts == Set("keep", "drop"))
  }

  test("langid confusion matrix: shares tile each language, diagonal = accuracy") {
    import org.apache.spark.sql.functions._
    val conf = TextAnalysis.langIdEval(spark, Sf001).collect()
    assert(conf.nonEmpty)
    // Per-language counts tile the corpus and shares sum to 1.
    val byLang = conf.groupBy(_.getString(0))
    val docsPerLang = graft.core.Sources.documents(spark, Sf001)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byLang.foreach { case (lang, rows) =>
      assert(rows.map(_.getLong(2)).sum == docsPerLang(lang))
      assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-4)
      rows.foreach(r => assert(
        r.getBoolean(4) == (r.getString(0) == r.getString(1))))
    }
    // Diagonal mass equals langId's own agreement count.
    val diag = conf.filter(_.getBoolean(4)).map(_.getLong(2)).sum
    val agrees = TextAnalysis.langId(spark, Sf001)
      .filter(col("agrees")).count()
    assert(diag == agrees)
  }

  test("winnowing: counts match a driver-side recomputation") {
    import org.apache.spark.sql.functions._
    graft.functions.WordNgramShingles.register(spark)
    def hash(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15),
      16)
    def expected(text: String, k: Int = 3, w: Int = 4) = {
      val toks = text.split(" ", -1)
      val grams = if (toks.length <= k) Seq(toks.mkString(" "))
        else toks.sliding(k).map(_.mkString(" ")).toSeq
      val h = grams.map(hash)
      val mins = if (h.length >= w) h.sliding(w).map(_.min).toSeq else Seq()
      (grams.length.toLong, mins.length.toLong, mins.distinct.length.toLong)
    }
    val texts = Seq(
      (1L, "a b c d e f"),      // 4 grams, 1 window
      (2L, "x y"),              // whole-text shingle, no window
      (3L, "one two three four five six seven eight nine ten"))
    val out = TextAnalysis.winnowingOf(texts.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1).toLong, r.getInt(2).toLong, r.getInt(3).toLong))).toMap
    texts.foreach { case (id, t) =>
      assert(out(id) == expected(t), s"doc $id")
    }
  }

  test("winnowing density is bounded and fingerprints never exceed windows") {
    val rows = TextAnalysis.winnowing(spark, Sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (g, win, fp) = (r.getInt(1), r.getInt(2), r.getInt(3))
      assert(win == math.max(g - 3, 0))
      assert(fp <= win && (win == 0 || fp >= 1))
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
  }

  test("boilerplate: shared sentences surface once, normalized and ranked") {
    import org.apache.spark.sql.functions._
    val rows = TextAnalysis.boilerplateOf(Seq(
      (1L, "unique intro one. all rights reserved. visit our site!"),
      (2L, "different body text here. all rights reserved. visit our site."),
      (3L, "all rights reserved! another unique middle. visit our site."),
      (4L, "totally unrelated content without shared lines"))
      .toDF("doc_id", "text"), minDocs = 3, k = 5)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    // Both 3-doc templates survive; punctuation variants collapsed; the
    // 1–2-doc sentences fall under the floor.  Tie broken by text ASC.
    assert(rows.toSeq == Seq(
      (1, "all rights reserved", 3L, 0.75),
      (2, "visit our site", 3L, 0.75)))
  }

  test("boilerplate respects the df floor on the real corpus") {
    val rows = TextAnalysis.boilerplate(spark, Sf001).collect()
    rows.foreach { r =>
      assert(r.getLong(2) >= 3L)
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
      assert(r.getString(1).nonEmpty)
    }
  }

  test("novelty bounds and totals hold on the real corpus") {
    val rows = TextAnalysis.novelty(spark, Sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, u, s) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(u >= 0 && u <= n)
      assert(s >= 0.0 && s <= 1.0)
    }
    // The corpus contains near-duplicate groups (the dedup fixtures), so
    // both regimes must occur.
    assert(rows.exists(_.getDouble(3) < 1.0))
    assert(rows.exists(_.getDouble(3) > 0.0))
  }

  test("tfidf: ranks contiguous, scores monotone, top-1 is the true argmax") {
    import org.apache.spark.sql.functions._
    val t = TextAnalysis.tfidf(spark, Sf001, topK = 5).cache()
    try {
      val byDoc = t.collect().groupBy(_.getAs[Long]("doc_id"))
      byDoc.foreach { case (doc, rows) =>
        val sorted = rows.sortBy(_.getAs[Int]("rnk"))
        assert(sorted.map(_.getAs[Int]("rnk")).toSeq == (1 to sorted.length),
          s"doc $doc ranks not contiguous")
        val scores = sorted.map(_.getAs[Double]("score"))
        assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
          s"doc $doc scores not monotone")
      }
      // Rarity dominates for equal tf: within any doc, a higher-df token
      // never outranks a lower-df token of the same tf.
      byDoc.values.foreach { rows =>
        rows.groupBy(_.getAs[Long]("tf")).values.foreach { same =>
          val byRank = same.sortBy(_.getAs[Int]("rnk")).map(_.getAs[Long]("df"))
          assert(byRank.zip(byRank.tail).forall { case (a, b) => a <= b })
        }
      }
      // Top-1 equals a brute-force argmax recomputed independently.
      val docs = graft.core.Sources.documents(spark, Sf001)
      val n = docs.count().toDouble
      val toks = docs.select($"doc_id",
          explode(split($"text", " ")).as("token"))
        .groupBy($"doc_id", $"token").count().collect()
      val dfm = toks.groupBy(_.getAs[String]("token"))
        .map { case (tok, rs) => tok -> rs.map(_.getAs[Long]("doc_id")).distinct.length }
      val top1 = t.filter($"rnk" === 1).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("token")).toMap
      toks.groupBy(_.getAs[Long]("doc_id")).foreach { case (doc, rs) =>
        val best = rs.map { r =>
          val tok = r.getAs[String]("token")
          val df = dfm(tok).toDouble
          (tok, r.getAs[Long]("count").toDouble * ((n - df + 0.5) / (df + 0.5)))
        }.minBy { case (tok, s) => (-s, tok) }
        assert(top1(doc) == best._1, s"doc $doc top-1 mismatch")
      }
    } finally t.unpersist()
  }

  test("quality invariants hold for every document") {
    val q = TextAnalysis.quality(spark, Sf001)
    assert(q.filter($"n_unique_tokens" > $"n_tokens").count() == 0)
    assert(q.filter($"lexical_diversity" > 1.0 || $"lexical_diversity" <= 0.0).count() == 0)
    assert(q.filter($"n_tokens" <= 0).count() == 0)
  }

  test("language ID predicts only known languages") {
    val langs = TextAnalysis.langId(spark, Sf001)
      .select("predicted_lang").distinct().as[String].collect().toSet
    assert(langs.subsetOf(TextAnalysis.Markers.map(_._1).toSet + "und"))
  }

  test("fingerprints are deterministic and mostly distinct on distinct texts") {
    val fp1 = TextAnalysis.fingerprint(spark, Sf001).as[(Long, Long)].collect().sortBy(_._1)
    val fp2 = TextAnalysis.fingerprint(spark, Sf001).as[(Long, Long)].collect().sortBy(_._1)
    assert(fp1.toSeq == fp2.toSeq)
    val distinctRatio = fp1.map(_._2).distinct.length.toDouble / fp1.length
    assert(distinctRatio > 0.9, s"fingerprint collision ratio too high: $distinctRatio")
  }

  test("BPE-ish tokenization counts at least the whitespace tokens") {
    val t = TextAnalysis.tokenCount(spark, Sf001)
    assert(t.filter($"bpe_ish_tokens" < $"ws_tokens").count() == 0)
  }

  test("repetition metrics obey their arithmetic bounds") {
    val r = TextAnalysis.repetition(spark, Sf001).cache()
    try {
      // n_bigrams = tokens - 1 (or 1 for a single-token doc), so it must
      // match the quality query's token counts exactly.
      val q = TextAnalysis.quality(spark, Sf001).select("doc_id", "n_tokens")
      val mismatched = r.join(q, "doc_id")
        .filter($"n_bigrams" !==
          org.apache.spark.sql.functions.greatest($"n_tokens" - 1,
            org.apache.spark.sql.functions.lit(1L)))
        .count()
      assert(mismatched == 0)
      assert(r.filter($"top_count" > $"n_bigrams").count() == 0)
      assert(r.filter($"distinct_bigrams" > $"n_bigrams").count() == 0)
      assert(r.filter($"top_fraction" <= 0.0 || $"top_fraction" > 1.0).count() == 0)
      assert(r.filter($"dup_fraction" < 0.0 || $"dup_fraction" > 1.0).count() == 0)
      // dup covers at least the top bigram whenever the top repeats.
      assert(r.filter($"top_count" > 1 &&
        $"dup_bigram_tokens" < $"top_count").count() == 0)
    } finally r.unpersist()
  }

  test("chunking covers every token and reconstructs the document head") {
    val S = 48; val C = 64
    val docs = graft.core.Sources.documents(spark, Sf001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val chunks = TextAnalysis.chunks(spark, Sf001, size = C, stride = S)
      .collect()
      .groupBy(_.getAs[Long]("doc_id"))
    assert(chunks.keySet == docs.keySet)
    chunks.foreach { case (id, rows) =>
      val toks = docs(id).split(" ", -1)
      val byId = rows.sortBy(_.getAs[Int]("chunk_id"))
      // Contiguous chunk ids from 0; count is a pure function of length.
      assert(byId.map(_.getAs[Int]("chunk_id")).toSeq ==
        (0 to math.max(toks.length - 1, 0) / S))
      // Chunk 0 is the document's head verbatim.
      assert(byId.head.getAs[String]("chunk_text") ==
        toks.take(C).mkString(" "))
      // Every chunk is the exact slice at its offset (so the union covers
      // every token and overlaps are exactly size - stride).
      byId.foreach { r =>
        val j = r.getAs[Int]("chunk_id")
        assert(r.getAs[String]("chunk_text") ==
          toks.slice(j * S, math.min(j * S + C, toks.length)).mkString(" "))
      }
    }
  }

  test("repetition agrees with a naive single-document recount") {
    val row = graft.core.Sources.documents(spark, Sf001)
      .orderBy($"doc_id").select("doc_id", "text").head()
    val (docId, text) = (row.getLong(0), row.getString(1))
    val toks = text.split(" ", -1)
    val bigrams =
      if (toks.length < 2) Seq(toks.mkString(" "))
      else toks.sliding(2).map(_.mkString(" ")).toSeq
    val counts = bigrams.groupBy(identity).view.mapValues(_.size)
    val got = TextAnalysis.repetition(spark, Sf001)
      .filter($"doc_id" === docId).head()
    assert(got.getAs[Long]("n_bigrams") == bigrams.size.toLong)
    assert(got.getAs[Long]("distinct_bigrams") == counts.size.toLong)
    assert(got.getAs[Long]("top_count") == counts.values.max.toLong)
  }

  test("redactPii masks emails, phones, and digit runs on literals") {
    // The driver gate only sees digit runs (the synthetic corpus has no
    // emails/phones) — this is where the other two patterns are proven.
    val cases = Seq(
      "write to jane.doe+x@corp.example.org now" -> "write to <EMAIL> now",
      "call +1 (555) 123-4567 today" -> "call <PHONE> today",
      "id 12345 and 9" -> "id <NUM> and <NUM>",
      "a@b.co or 555-123-9876" -> "<EMAIL> or <PHONE>",
      "clean text stays clean" -> "clean text stays clean")
    val got = cases.map(_._1).toDF("t")
      .select(TextAnalysis.redactPii($"t").as("r"))
      .collect().map(_.getString(0)).toSeq
    assert(got === cases.map(_._2))
    // Idempotence: redaction tokens contain no redactable substrings.
    val twice = cases.map(_._2).toDF("t")
      .select(TextAnalysis.redactPii($"t").as("r"))
      .collect().map(_.getString(0)).toSeq
    assert(twice === cases.map(_._2))
  }

  test("lm score matches a driver-side bigram-LM recomputation") {
    val docs = graft.core.Sources.documents(spark, Sf001)
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    val bigrams = docs.view.mapValues(ts => ts.zip(ts.drop(1))).toMap
    val cBigram = bigrams.values.flatten
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cContext = cBigram.groupBy(_._1._1).view
      .mapValues(_.values.sum).toMap
    def p(bg: (String, String)): BigDecimal =
      BigDecimal(cBigram(bg).toDouble / cContext(bg._1).toDouble)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val got = graft.llm.Vocab.lmScore(spark, Sf001).collect()
      .map(r => r.getLong(0) -> r).toMap
    // Every multi-token doc appears; single-token docs drop.
    assert(got.keySet === bigrams.filter(_._2.nonEmpty).keySet)
    bigrams.filter(_._2.nonEmpty).foreach { case (id, bgs) =>
      val r = got(id)
      val sumP = bgs.map(p).sum
      assert(r.getLong(r.fieldIndex("n_bigrams")) === bgs.length.toLong)
      assert(BigDecimal(r.getDecimal(r.fieldIndex("sum_p"))) === sumP)
      val want = BigDecimal(sumP.toDouble / bgs.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(r.fieldIndex("lm_score")) === want)
      // An ML bigram probability is in (0, 1]; so is its mean.
      val s = r.getDouble(r.fieldIndex("lm_score"))
      assert(s > 0.0 && s <= 1.0)
    }
    // The score must discriminate at sf0.001 — all-equal scores would
    // mean the filter carries no signal on the real corpus.
    val scores = got.values.map(r => r.getDouble(r.fieldIndex("lm_score")))
    assert(scores.toSet.size > 1)
  }

  test("rake matches a driver-side recomputation of the full algorithm") {
    val stops = Set("the", "and", "of", "a", "to")
    val docs = graft.core.Sources.documents(spark, Sf001)
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    // Phrases: maximal stopword-free runs, keyed by the running stop count.
    val phrasesByDoc = docs.view.mapValues { toks =>
      var sid = 0
      val tagged = toks.map { t =>
        if (stops(t)) { sid += 1; None } else Some((sid, t))
      }.flatten
      tagged.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    }.toMap
    val got = graft.llm.TextAnalysis.rake(spark, Sf001).collect()
      .groupBy(_.getLong(0))
    docs.keys.foreach { id =>
      val phrases = phrasesByDoc(id)
      if (phrases.nonEmpty) {
        // Word scores: deg/freq within the document.
        val occurrences = phrases.toSeq.flatMap { case (pid, ws) =>
          ws.map(w => (w, ws.length, pid))
        }
        val wscore = occurrences.groupBy(_._1).map { case (w, os) =>
          w -> BigDecimal(os.map(_._2).sum.toDouble / os.length)
            .setScale(9, BigDecimal.RoundingMode.HALF_UP)
        }
        val scored = phrases.toSeq.map { case (pid, ws) =>
          (pid, ws.mkString(" "), ws.length.toLong, ws.map(wscore).sum)
        }
        val want = scored.sortBy { case (pid, phrase, _, score) =>
          (-score, phrase, pid)
        }.take(3).map { case (_, phrase, plen, score) =>
          (phrase, plen, score)
        }
        val rows = got(id).sortBy(_.getInt(1)).toSeq
        assert(rows.map(_.getInt(1)) === (1 to want.length), s"doc $id ranks")
        val gotTriples = rows.map(r =>
          (r.getString(2), r.getLong(3), BigDecimal(r.getDecimal(4))))
        assert(gotTriples === want, s"doc $id top phrases")
      } else assert(!got.contains(id), s"doc $id should have no phrases")
    }
  }

  test("fertility: hand-computed ratios on a two-language fixture") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fertility").toString
    Seq(
      // "ab cd": 5 chars, 2 words, 2 letter-run tokens.
      (1L, "ab cd", "aa", "s", 5L),
      // "a1!": 3 chars, 1 word, 3 BPE-ish tokens (a / 1 / !).
      (2L, "a1!", "bb", "s", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.fertility(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6), r.getDouble(7)))).toMap
    assert(out("aa") == ((1L, 5L, 2L, 2L, 2.5, 2.5, 1.0)))
    assert(out("bb") == ((1L, 3L, 1L, 3L, 3.0, 1.0, 3.0)))
  }

  test("burstiness: hand-computed cf/df split on a two-doc fixture") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bursty").toString
    Seq((1L, "x x y", "en", "s", 5L), (2L, "x z", "en", "s", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.burstiness(spark, dir).collect()
      .map(r => r.getString(1) -> ((r.getInt(0), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))).toMap
    assert(out("x") == ((1, 3L, 2L, 1.5, 1.0)))
    assert(out("y") == ((2, 1L, 1L, 1.0, 0.5)))
    assert(out("z") == ((3, 1L, 1L, 1.0, 0.5)))
  }

  test("burstiness bounds hold over the real vocabulary head") {
    val rows = TextAnalysis.burstiness(spark, Sf001).collect()
    assert(rows.nonEmpty && rows.length <= 30)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(3)) // cf >= df
      assert(r.getDouble(4) >= 1.0)
      assert(r.getDouble(5) > 0.0 && r.getDouble(5) <= 1.0)
    }
  }

  test("fertility totals recompute from tokenCount on the real corpus") {
    val fromCounts = TextAnalysis.tokenCount(spark, Sf001)
      .join(graft.core.Sources.documents(spark, Sf001), "doc_id")
      .groupBy(org.apache.spark.sql.functions.col("lang"))
      .agg(
        org.apache.spark.sql.functions.expr(
          "CAST(SUM(ws_tokens) AS BIGINT)").as("ws"),
        org.apache.spark.sql.functions.expr(
          "CAST(SUM(bpe_ish_tokens) AS BIGINT)").as("bpe"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    val rows = TextAnalysis.fertility(spark, Sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert((r.getLong(3), r.getLong(4)) == fromCounts(r.getString(0)))
      assert(r.getDouble(7) >= 1.0) // a word is at least one subword
    }
  }

  test("kappa: hand-computed chance-corrected agreement") {
    // 4 en docs (3 predicted en via 'the', 1 mispredicted es via 'slow'),
    // 2 es docs predicted es.  N=6, diag=5, rows (en 4, es 2),
    // cols (en 3, es 3) → P = 4·3 + 2·3 = 18,
    // κ = (6·5 − 18)/(36 − 18) = 12/18 = 0.666667; accuracy 5/6.
    val dir = java.nio.file.Files.createTempDirectory("kappa").toString
    Seq(
      (1L, "the the", "en"), (2L, "the", "en"), (3L, "the the the", "en"),
      (4L, "slow slow", "en"),
      (5L, "slow", "es"), (6L, "slow slow slow", "es"))
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TextAnalysis.langIdKappa(spark, dir).collect().head
    assert(r.getLong(0) == 6L && r.getLong(1) == 5L && r.getLong(2) == 18L)
    assert(r.getDouble(3) == math.rint(5.0 / 6.0 * 1e6) / 1e6)
    assert(r.getDouble(4) == math.rint(12.0 / 18.0 * 1e6) / 1e6)
  }

  test("kappa: majority-class guesser scores high accuracy but zero-ish kappa") {
    // Every doc predicted 'en' (the marker ladder sees only 'the'):
    // accuracy = share of true-en, but κ = (N·D − P)/(N² − P) with
    // P = N·col_en = N·N... here rows (en 5, es 1), cols (en 6, es 0)
    // → P = 30, κ = (6·5 − 30)/(36 − 30) = 0.
    val dir = java.nio.file.Files.createTempDirectory("kappa0").toString
    Seq(
      (1L, "the", "en"), (2L, "the", "en"), (3L, "the", "en"),
      (4L, "the", "en"), (5L, "the", "en"), (6L, "the", "es"))
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TextAnalysis.langIdKappa(spark, dir).collect().head
    assert(r.getDouble(3) == math.rint(5.0 / 6.0 * 1e6) / 1e6)
    assert(r.getDouble(4) == 0.0)
  }

  test("mcnemar: discordant cells and statistic match hand computation") {
    // en:4 es:3 → baseline predicts 'en' everywhere.  Classifier (marker
    // ladder): docs 5,7 correct-es where baseline fails (b=2); doc 4
    // mispredicted es where baseline is right (c=1); doc 6 both wrong;
    // docs 1-3 both right.  χ² = (2−1)²/(2+1) = 0.333333.
    val dir = java.nio.file.Files.createTempDirectory("mcnemar").toString
    Seq(
      (1L, "the", "en"), (2L, "the", "en"), (3L, "the", "en"),
      (4L, "slow slow", "en"),
      (5L, "slow", "es"), (6L, "the", "es"), (7L, "slow slow slow", "es"))
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TextAnalysis.langIdMcNemar(spark, dir).collect().head
    assert(r.getString(0) == "en")
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((2L, 1L, 3L, 1L)))
    assert(r.getDouble(5) == math.rint(1.0 / 3.0 * 1e6) / 1e6)
  }

  test("mcnemar: all-concordant corpus yields NULL, not an ANSI error") {
    val dir = java.nio.file.Files.createTempDirectory("mcnemar0").toString
    Seq((1L, "the", "en"), (2L, "the the", "en"))
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TextAnalysis.langIdMcNemar(spark, dir).collect().head
    assert((r.getLong(1), r.getLong(2)) == ((0L, 0L)))
    assert(r.isNullAt(5))
  }

  test("kappa: single-category perfect agreement is NULL, not a crash") {
    // One language, always predicted: pe_num = N² and κ is undefined —
    // ANSI division must be NULLIF-guarded, not error.
    val dir = java.nio.file.Files.createTempDirectory("kappa1").toString
    Seq((1L, "the", "en"), (2L, "the the", "en"))
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TextAnalysis.langIdKappa(spark, dir).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L && r.getLong(2) == 4L)
    assert(r.getDouble(3) == 1.0)
    assert(r.isNullAt(4))
  }
}

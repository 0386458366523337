package graft

import org.apache.spark.sql.functions._

import graft.llm.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again", "en"),
    (2L, "the quick brown fox jumps over the lazy dog again and again", "en"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat again and again", "en"), // near dup of 1
    (4L, "completely different words about spark shuffles and partitions here", "en")
  ).toDF("doc_id", "text", "lang")

  private lazy val sigs = Dedup.minhashSignatures(docs).cache()

  private def sigMap = sigs.select("doc_id", "sig").collect()
    .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap

  test("identical texts get identical minhash signatures") {
    val m = sigMap
    assert(m(1L) == m(2L))
    assert(m(1L).length == Dedup.NumHashes)
  }

  test("near-duplicates share most signature positions, unrelated docs few") {
    val m = sigMap
    def agree(a: Long, b: Long): Int =
      m(a).zip(m(b)).count { case (x, y) => x == y }
    assert(agree(1L, 3L) > Dedup.NumHashes / 2,
      s"near-dups agree on ${agree(1L, 3L)}/${Dedup.NumHashes}")
    assert(agree(1L, 4L) < Dedup.NumHashes / 4,
      s"unrelated agree on ${agree(1L, 4L)}/${Dedup.NumHashes}")
  }

  test("signatures are deterministic across evaluations") {
    val a = Dedup.minhashSignatures(docs).collect().map(_.toSeq).sortBy(_.head.toString)
    val b = Dedup.minhashSignatures(docs).collect().map(_.toSeq).sortBy(_.head.toString)
    assert(a.toSeq == b.toSeq)
  }

  test("embedding-cosine candidates are ordered pairs above the threshold, deterministically") {
    val a = Dedup.embeddingCosine(spark, Sf001)
      .as[(Long, Long, Double)].collect().sortBy(p => (p._1, p._2))
    val b = Dedup.embeddingCosine(spark, Sf001)
      .as[(Long, Long, Double)].collect().sortBy(p => (p._1, p._2))
    assert(a.nonEmpty)
    assert(a.forall { case (x, y, c) => x < y && c >= 0.35 })
    assert(a.toSeq == b.toSeq)
  }

  test("adaptiveLshBits: integer-only sizing rule, clamped, mean bucket size bounded") {
    // The rule: smallest bits with 2^bits >= ceil(count/40), in [6, 24] —
    // integer-exact so the SQL twin (ceil-div + bit length) can't drift.
    assert(Dedup.adaptiveLshBits(0) == 6)
    assert(Dedup.adaptiveLshBits(200) == 6)     // sf0.01 → floor clamp
    assert(Dedup.adaptiveLshBits(2000) == 6)    // sf0.1: ceil(50)→6
    assert(Dedup.adaptiveLshBits(20000) == 9)   // sf1: the SCALE_r10 sizing
    assert(Dedup.adaptiveLshBits(200000) == 13) // sf10: no manual knob
    assert(Dedup.adaptiveLshBits(40L << 24) == 24) // ceiling clamp
    // Exact powers of two (the float-log2 danger zone): 40*2^k vectors
    // need exactly k buckets' worth of bits.
    assert(Dedup.adaptiveLshBits(40 * 512) == 9)
    assert(Dedup.adaptiveLshBits(40 * 512 + 1) == 10)
    // At the spec corpus the adaptive entry IS the default-bits entry.
    val fixed = Dedup.embeddingCosine(spark, Sf001)
      .as[(Long, Long, Double)].collect().sortBy(p => (p._1, p._2)).toSeq
    val adaptive = Dedup.embeddingCosineAdaptive(spark, Sf001)
      .as[(Long, Long, Double)].collect().sortBy(p => (p._1, p._2)).toSeq
    assert(adaptive == fixed)
  }

  test("embeddingCosine refuses a grossly mis-sized table width (fail fast, not spill)") {
    // bits four or more below the corpus-sized width means ~16x+ the
    // design mean bucket size - the config that spilled ~100 GB and died
    // at sf10.  It must refuse in the driver, before any pair join runs.
    val e = intercept[IllegalArgumentException] {
      Dedup.embeddingCosine(spark, Sf001, bits = 2)
    }
    assert(e.getMessage.contains("sized for a smaller corpus"))
    // The boundary: 3 bits under is still allowed (the sf1 default-bits
    // configuration the full sf1 sweep runs green).
    Dedup.embeddingCosine(spark, Sf001, bits = 3).collect()
  }

  test("simhash bands are 16-bit, deterministic, and equal for identical texts") {
    val bands = Dedup.simhash(spark, Sf001)
    val rows = bands.collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      (1 to 4).foreach { i =>
        val v = r.getInt(i)
        assert(v >= 0 && v <= 0xFFFF, s"band out of 16-bit range: $v")
      }
    }
    val again = Dedup.simhash(spark, Sf001).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("prefix-filtered jaccard equals the naive all-pairs result") {
    // The AllPairs prefix filter must be LOSSLESS: same pairs, same scores
    // as the quadratic within-(lang, source) formulation it replaced.
    val fast = Dedup.ngramJaccard(spark, Sf001)
      .as[(String, String, Long, Long, Double)].collect().toSet
    val docs = graft.core.Sources.documents(spark, Sf001)
      .select(col("doc_id"), col("lang"), col("source"),
        array_distinct(split(col("text"), " ")).as("toks"))
    val naive = docs.select(col("lang"), col("source"),
        col("doc_id").as("doc_a"), col("toks").as("toks_a"))
      .join(docs.select(col("lang"), col("source"),
        col("doc_id").as("doc_b"), col("toks").as("toks_b")),
        Seq("lang", "source"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("lang"), col("source"), col("doc_a"), col("doc_b"),
        expr("""size(array_intersect(toks_a, toks_b)) /
               | CAST(size(toks_a) + size(toks_b)
               |      - size(array_intersect(toks_a, toks_b)) AS DOUBLE)""".stripMargin)
          .as("jaccard"))
      .filter(col("jaccard") >= 0.3)
      .as[(String, String, Long, Long, Double)].collect().toSet
    assert(naive.nonEmpty)
    assert(fast == naive)
  }

  test("prefix-filtered 3-gram jaccard equals the naive all-pairs result") {
    // Same losslessness proof over word-3-gram shingle sets — the prefix
    // bound is token-representation-agnostic.
    val fast = Dedup.ngramJaccard(spark, Sf001, minJaccard = 0.2, n = 3)
      .as[(String, String, Long, Long, Double)].collect().toSet
    val docs = graft.core.Sources.documents(spark, Sf001)
      .select(col("doc_id"), col("lang"), col("source"),
        expr(Dedup.ngramSetExpr("text", 3)).as("toks"))
    val naive = docs.select(col("lang"), col("source"),
        col("doc_id").as("doc_a"), col("toks").as("toks_a"))
      .join(docs.select(col("lang"), col("source"),
        col("doc_id").as("doc_b"), col("toks").as("toks_b")),
        Seq("lang", "source"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("lang"), col("source"), col("doc_a"), col("doc_b"),
        expr("""size(array_intersect(toks_a, toks_b)) /
               | CAST(size(toks_a) + size(toks_b)
               |      - size(array_intersect(toks_a, toks_b)) AS DOUBLE)""".stripMargin)
          .as("jaccard"))
      .filter(col("jaccard") >= 0.2)
      .as[(String, String, Long, Long, Double)].collect().toSet
    assert(fast == naive)
  }

  test("minhash-LSH candidates on testdata are symmetric-free ordered pairs") {
    val pairs = Dedup.minhashCandidates(spark, Sf001)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall { case (a, b) => a < b })
    assert(pairs.distinct.length == pairs.length)
  }

  test("decontamination equals brute-force shingle intersection") {
    val n = 8
    val src = "src5"
    val docs = graft.core.Sources.documents(spark, Sf001)
      .select(col("doc_id"), col("source"),
        expr(Dedup.ngramSetExpr("text", n)).as("sh"))
      .as[(Long, String, Seq[String])].collect()
    val bench = docs.filter(_._2 == src).flatMap(_._3).toSet
    val expected = docs.filterNot(_._2 == src)
      .map { case (id, _, sh) => id -> sh.toSet.intersect(bench).size.toLong }
      .filter(_._2 > 0).toMap
    val got = Dedup.decontaminate(spark, Sf001, src, n)
      .as[(Long, Long)].collect().toMap
    assert(got == expected)
    assert(got.nonEmpty) // src5/n=8 is known-contaminated in the testdata
  }

  test("asymmetric containment equals the naive all-pairs result") {
    // The asymmetric prefix filter (query-side prefix vs full index)
    // must also be lossless: same ordered pairs, same scores as the
    // quadratic same-lang formulation.
    val fast = Dedup.containment(spark, Sf001)
      .as[(String, Long, Long, Double)].collect().toSet
    val docs = graft.core.Sources.documents(spark, Sf001)
      .select(col("doc_id"), col("lang"),
        expr(Dedup.ngramSetExpr("text", 3)).as("toks"))
    val naive = docs.select(col("lang"),
        col("doc_id").as("doc_a"), col("toks").as("toks_a"))
      .join(docs.select(col("lang"),
        col("doc_id").as("doc_b"), col("toks").as("toks_b")), Seq("lang"))
      .filter(col("doc_a") =!= col("doc_b"))
      .select(col("lang"), col("doc_a"), col("doc_b"),
        expr("""size(array_intersect(toks_a, toks_b)) /
               | CAST(size(toks_a) AS DOUBLE)""".stripMargin)
          .as("containment"))
      .filter(col("containment") >= 0.3)
      .as[(String, Long, Long, Double)].collect().toSet
    assert(naive.nonEmpty)
    assert(fast == naive)
  }

  test("containment is asymmetric where jaccard is blind: doc-inside-doc") {
    import spark.implicits._
    // A short doc quoted verbatim inside a much longer one: containment
    // short→long = 1.0, long→short small, jaccard small both ways.
    val short_ = "alpha beta gamma delta epsilon zeta eta theta"
    val long_ = ("one two three four five six seven eight nine ten " * 4) +
      short_ + " eleven twelve thirteen fourteen fifteen sixteen"
    val dir = java.nio.file.Files.createTempDirectory("containment").toString
    Seq((1L, short_, "en", "a", short_.length.toLong),
        (2L, long_, "en", "b", long_.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Dedup.containment(spark, dir)
      .as[(String, Long, Long, Double)].collect()
      .map(r => (r._2, r._3) -> r._4).toMap
    assert(rows((1L, 2L)) == 1.0) // every 3-gram of the short doc is in the long
    assert(rows.get((2L, 1L)).forall(_ < 0.3)) // long→short fails the gate
  }

  test("verbatim-span dedup equals the naive owner scan") {
    val n = 15
    val docs = graft.core.Sources.documents(spark, Sf001)
      .select(col("doc_id"), expr(Dedup.ngramSetExpr("text", n)).as("sh"))
      .as[(Long, Seq[String])].collect()
    val owner = scala.collection.mutable.Map.empty[String, Long]
    docs.sortBy(_._1).foreach { case (id, sh) =>
      sh.toSet.foreach { s: String =>
        if (!owner.contains(s) || owner(s) > id) owner(s) = id
      }
    }
    val expected = docs.map { case (id, sh) =>
      val set = sh.toSet
      (id, set.size.toLong, set.count(s => owner(s) < id).toLong)
    }.toSet
    val got = Dedup.verbatimSpans(spark, Sf001, n)
      .select("doc_id", "n_spans", "dup_spans")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expected)
    // The lowest doc_id can never be flagged; something must be flagged in
    // the synthetic corpus (near-identical docs share 15-token spans).
    val lowest = docs.map(_._1).min
    assert(got.find(_._1 == lowest).get._3 == 0L)
    assert(got.exists(_._3 > 0L))
  }

  test("duplicate clusters equal union-find over the pair graph") {
    val pairs = Dedup.minhashCandidates(spark, Sf001)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    // Reference union-find on the driver (test scale only).
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(d => d -> find(d)).toMap
    val got = Dedup.duplicateClusters(spark, Sf001)
      .as[(Long, Long)].collect().toMap
    assert(got == expected)
    // Canonical representative is the cluster min: every cluster_id is a
    // member of its own cluster.
    assert(got.values.toSet.forall(c => got(c) == c))
  }

  test("incremental minhash equals the full pair set restricted to the batch") {
    // The operator's contract: running the incremental form over a new
    // batch yields EXACTLY the full-dedup pairs touching that batch — so
    // daily increments accumulate the same pair set as a full re-run.
    val full = Dedup.minhashCandidates(spark, Sf001)
      .select("doc_a", "doc_b", "est_jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val srcOf = graft.core.Sources.documents(spark, Sf001)
      .select("doc_id", "source").as[(Long, String)].collect().toMap
    // Exercise every source present in the full pair set, plus one that
    // (usually) isn't — the subset identity must hold for all of them.
    val sources = full.flatMap(p => Seq(srcOf(p._1), srcOf(p._2))).take(3) + "src19"
    sources.foreach { src =>
      val inc = Dedup.minhashIncremental(spark, Sf001, newSource = src)
        .select("doc_a", "doc_b", "est_jaccard")
        .as[(Long, Long, Double)].collect().toSet
      val expected = full.filter(p =>
        srcOf(p._1) == src || srcOf(p._2) == src)
      assert(inc == expected, s"source $src: got $inc expected $expected")
    }
  }

  test("corpus overlap: hand-computed shingle-set Jaccard per source pair") {
    // X: {"a b c", "b c d"}; Y: {"b c d", "c d e"}; Z shares nothing.
    // X∩Y = 1, |X|=|Y|=2 → J = 1/3.  Pairs with empty intersection
    // (X–Z, Y–Z) must not be rows.
    val docs = Seq(
      (1L, "a b c d", "X"), (2L, "a b c d", "X"), // dup doc adds nothing
      (3L, "b c d e", "Y"), (4L, "p q r s", "Z"))
      .toDF("doc_id", "text", "source")
    val rows = Dedup.corpusOverlapOf(docs, n = 3).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert((r.getString(0), r.getString(1)) === (("X", "Y")))
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) === ((1L, 2L, 2L)))
    assert(r.getDouble(5) === 0.333333)
  }

  test("corpus overlap on testdata: ordered pairs, valid Jaccard, consistent sizes") {
    val out = Dedup.corpusOverlap(spark, Sf001).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getString(0) < r.getString(1)))
    out.foreach { r =>
      val (common, szA, szB) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(common > 0 && common <= math.min(szA, szB))
      val j = r.getDouble(5)
      assert(j > 0.0 && j <= 1.0)
      // The rounded quotient reproduces from the integer cells.
      val expect = BigDecimal(common.toDouble / (szA + szB - common))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(j === expect)
    }
    // One size per source, consistent across every pair it appears in.
    val sizes = out.flatMap(r => Seq(r.getString(0) -> r.getLong(3),
      r.getString(1) -> r.getLong(4))).toMap
    out.foreach { r =>
      assert(sizes(r.getString(0)) === r.getLong(3))
      assert(sizes(r.getString(1)) === r.getLong(4))
    }
  }

  test("cluster resolution keeps one canonical doc per cluster, longest wins") {
    import spark.implicits._
    // Docs 1,2,3 near-identical (one cluster; 3 is longest → canonical);
    // doc 4 unrelated (singleton, keeps itself).
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val dir = java.nio.file.Files.createTempDirectory("resolve").toString
    Seq(
      (1L, base, "en", "a", base.length.toLong),
      (2L, base + " phi", "en", "a", (base + " phi").length.toLong),
      (3L, base + " phi chi", "en", "a", (base + " phi chi").length.toLong),
      (4L, "one two three four five six seven eight nine ten eleven " +
        "twelve thirteen fourteen fifteen", "en", "b", 90L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Dedup.resolveDuplicates(spark, dir)
      .as[(Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows.size == 4)
    // One cluster of {1,2,3}: min-label cluster_id 1, canonical = 3 (longest).
    Seq(1L, 2L, 3L).foreach { id =>
      assert(rows(id)._2 == 1L && rows(id)._3 == 3L && rows(id)._4 == 3L)
    }
    assert(Seq(1L, 2L, 3L).map(rows(_)._5) == Seq(false, false, true))
    // Singleton: own cluster, size 1, keeps itself.
    assert(rows(4L) == ((4L, 4L, 1L, 4L, true)))
    // Filtering keep yields exactly the cleaned corpus.
    assert(rows.values.count(_._5) == 2)
  }

  test("split leakage tiles the candidate pairs and flags cross-split rows") {
    graft.functions.MinHashSignature.register(spark)
    val m = Dedup.splitLeakage(spark, Sf001).collect()
    assert(m.nonEmpty)
    val valid = Set("train", "val", "test")
    m.foreach { r =>
      val (lo, hi) = (r.getString(0), r.getString(1))
      assert(valid(lo) && valid(hi) && lo <= hi)
      assert(r.getBoolean(4) == (lo != hi))
      assert(r.getDouble(3) >= 0.2 && r.getDouble(3) <= 1.0)
    }
    // The matrix must tile the full candidate-pair population exactly.
    val total = m.map(_.getLong(2)).sum
    assert(total == Dedup.minhashCandidates(spark, Sf001).count())
  }

  test("lsh eval: counts tile both pair sets and ratios are consistent") {
    graft.functions.MinHashSignature.register(spark)
    graft.functions.WordNgramShingles.register(spark)
    val r = Dedup.lshEval(spark, Sf001).collect().head
    val (nExact, nCand, tp, fp, fn) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(nExact == tp + fn && nCand == tp + fp)
    assert(nExact == Dedup.ngramJaccard(spark, Sf001, 0.2, n = 3).count())
    assert(nCand == Dedup.minhashCandidates(spark, Sf001).count())
    assert(tp > 0, "the corpus's near-dup fixtures must yield true positives")
    assert(r.getDouble(5) == math.rint(tp.toDouble / nCand * 1e6) / 1e6)
    assert(r.getDouble(6) == math.rint(tp.toDouble / nExact * 1e6) / 1e6)
  }

  test("threshold sweep bins tile the exact pair set") {
    graft.functions.WordNgramShingles.register(spark)
    val bins = Dedup.thresholdSweep(spark, Sf001).collect()
    assert(bins.nonEmpty)
    bins.foreach { r =>
      val b = r.getInt(0)
      assert(b >= 1 && b <= 10)
      assert(r.getDouble(2) == b / 10.0)
      assert(r.getLong(1) >= 1L)
    }
    val total = bins.map(_.getLong(1)).sum
    assert(total == Dedup.ngramJaccard(spark, Sf001, 0.1, n = 1).count())
  }

  test("source matrix tiles the banding pairs with correct cross flags") {
    graft.functions.MinHashSignature.register(spark)
    val m = Dedup.sourceMatrix(spark, Sf001).collect()
    assert(m.nonEmpty)
    m.foreach { r =>
      assert(r.getString(0) <= r.getString(1))
      assert(r.getBoolean(4) == (r.getString(0) != r.getString(1)))
      assert(r.getDouble(3) >= 0.2 && r.getDouble(3) <= 1.0)
    }
    assert(m.map(_.getLong(2)).sum ==
      Dedup.minhashCandidates(spark, Sf001).count())
  }

  test("band tuning: nested-band supersets, default config matches pipeline") {
    graft.functions.MinHashSignature.register(spark)
    val t = Dedup.bandTuning(spark, Sf001).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(t.keySet == Set((32, 2), (16, 4), (8, 8)))
    // A 4-row band agreement implies both aligned 2-row sub-band
    // agreements (and an 8-row band its two 4-row halves), so the pair
    // sets nest: finer bands can only ADD candidates.
    assert(t((32, 2)) >= t((16, 4)) && t((16, 4)) >= t((8, 8)))
    // The (16, 4) row IS the production banding.
    assert(t((16, 4)) == Dedup.minhashPairs(spark, Sf001)._2.count())
  }

  test("cluster resolution invariants hold over the real corpus") {
    import spark.implicits._
    val res = Dedup.resolveDuplicates(spark, Sf001)
      .as[(Long, Long, Long, Long, Boolean)].collect()
    // Total coverage: one verdict per document.
    val nDocs = graft.core.Sources.documents(spark, Sf001).count()
    assert(res.length.toLong == nDocs)
    val byCluster = res.groupBy(_._2)
    byCluster.foreach { case (cid, members) =>
      // Exactly one keeper per cluster, and it IS the canonical id every
      // member points at.
      val keepers = members.filter(_._5)
      assert(keepers.length == 1, s"cluster $cid has ${keepers.length} keepers")
      assert(members.map(_._4).distinct.toSeq == Seq(keepers.head._1))
      // Reported size is the real membership.
      assert(members.forall(_._3 == members.length.toLong))
      // Min-label convention: cluster id is a member.
      assert(members.exists(_._1 == cid))
    }
    // Cleaned-corpus size = number of clusters.
    assert(res.count(_._5) == byCluster.size)
  }

  test("line dedup: shared lines excised, survivors rebuilt in order") {
    val aLine = (1 to 8).map(i => s"a$i").mkString(" ")
    val bLine = (1 to 8).map(i => s"b$i").mkString(" ")
    val cLine = (1 to 8).map(i => s"c$i").mkString(" ")
    val eLine = (1 to 8).map(i => s"e$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("linededup").toString
    Seq(
      (1L, s"$aLine $bLine"), // shares its first line with docs 2 and 4
      (2L, s"$aLine $cLine"),
      (3L, "lonely short document"), // one partial line, unique
      (4L, aLine + " tail one"), // 10 tokens: shared line + 2-token tail
      (5L, eLine), (6L, eLine)) // exact dups: everything dropped
      .map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Dedup.lineDedup(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((2L, 1L, bLine)))
    assert(out(2L) == ((2L, 1L, cLine)))
    assert(out(3L) == ((1L, 0L, "lonely short document")))
    // Line identity is offset-free: doc 4's aLine matches docs 1/2
    // even though they carry it at other positions; the short tail
    // line survives and rebuilds alone.
    assert(out(4L) == ((2L, 1L, "tail one")))
    assert(out(5L) == ((1L, 1L, "")))
    assert(out(6L) == ((1L, 1L, "")))
  }

  test("line dedup on the real corpus: untouched docs rebuild verbatim") {
    val joined = Dedup.lineDedup(spark, Sf001)
      .join(graft.core.Sources.documents(spark, Sf001), "doc_id")
      .select(col("n_lines"), col("n_dropped"), col("clean_text"),
        col("text"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getLong(1) <= r.getLong(0))
      if (r.getLong(1) == 0L)
        assert(r.getString(2) == r.getString(3), "lossless rebuild broke")
      else assert(r.getString(2).length < r.getString(3).length)
    }
  }
}

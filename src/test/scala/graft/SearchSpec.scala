package graft

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.functions._

import graft.llm.Search

/** BM25 retrieval: a hand-recomputed synthetic corpus (identical IEEE
  * chain + 9-dp decimal summation), rarity dominance of the low-df
  * query term, and ranking-contract sanity on the real corpus. */
class SearchSpec extends SparkSpec {

  import spark.implicits._

  private def run(docs: Seq[(Long, String)]) =
    Search.bm25Of(docs.toDF("doc_id", "text")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2),
        r.getDecimal(3)))

  test("synthetic corpus matches a driver-side recomputation") {
    val docs = Seq[(Long, String)](
      (1L, "dup vector alpha beta"),
      (2L, "vector query query gamma delta eps"),
      (3L, "alpha beta gamma"),
      (4L, "dup dup query zeta"))
    val out = run(docs)
    // Driver-side BM25 with the same op order: idf = (N−df+.5)/(df+.5),
    // tf-part = (tf·2.2)/(tf + 1.2·(0.25 + 0.75·len/avgdl)), terms
    // rounded to 9 dp and summed as decimals.
    val lens = docs.map { case (id, t) => id -> t.split(" ").length }.toMap
    val n = docs.size.toDouble
    val avgdl = lens.values.sum.toDouble / n
    val tfs = docs.flatMap { case (id, t) =>
      t.split(" ").filter(Search.QueryTerms.contains)
        .groupBy(identity).map { case (tok, xs) => (id, tok, xs.length) }
    }
    val dfs = tfs.groupBy(_._2).map { case (tok, xs) => tok -> xs.size }
    val expected = tfs.groupBy(_._1).map { case (id, terms) =>
      val score = terms.map { case (_, tok, tf) =>
        val idf = (n - dfs(tok) + 0.5) / (dfs(tok) + 0.5)
        val term = idf * (tf * (1.2 + 1.0)) /
          (tf + 1.2 * (1.0 - 0.75 + 0.75 * lens(id) / avgdl))
        new JBigDecimal(term).setScale(9, RoundingMode.HALF_UP)
      }.reduce(_ add _)
      id -> (terms.size, score)
    }
    assert(out.length === expected.size)
    out.foreach { case (_, id, nTerms, score) =>
      val (en, es) = expected(id)
      assert(nTerms === en, s"doc $id")
      assert(score.compareTo(es) === 0, s"doc $id: $score vs $es")
    }
    // Ranking: strictly ordered by (score DESC, doc_id ASC), rnk 1..k.
    assert(out.map(_._1).toSeq === (1 to out.length))
    val sorted = out.sortBy { case (_, id, _, s) => (s.negate, id) }
    assert(sorted.map(_._2).toSeq === out.map(_._2).toSeq)
  }

  test("the rare query term dominates the ranking on the real corpus") {
    val top = Search.bm25(spark, Sf001).collect()
    assert(top.length === Search.TopK)
    assert(top.map(_.getInt(0)).toSeq === (1 to Search.TopK))
    // idf('dup') ≈ 18 vs ≈ 0.3 for the common terms, and tf saturates
    // at k1+1: every top-10 document must contain the rare term.
    val dupDocs = graft.core.Sources.documents(spark, Sf001)
      .filter(array_contains(split(col("text"), " "), "dup"))
      .select("doc_id").as[Long].collect().toSet
    assert(top.forall(r => dupDocs.contains(r.getLong(1))))
  }

  test("a doc matching no query term never appears") {
    val out = run(Seq((1L, "dup alpha"), (2L, "beta gamma")))
    assert(out.map(_._2).toSet === Set(1L))
  }
}

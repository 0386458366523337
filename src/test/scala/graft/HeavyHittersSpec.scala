package graft

import scala.collection.mutable

import graft.functions.{HeavyHitters, Mix31}

/** The Misra-Gries guarantees the driver gate can't see (it only checks
  * the exact regime): the n/(k+1) estimate band, survivorship of every
  * true heavy hitter, and both properties under partitioned merge. */
class HeavyHittersSpec extends SparkSpec {

  // Deterministic skewed stream: item i appears ~ proportional to 1/i
  // (head items dominate, a long tail of near-singletons).
  private def stream(n: Int): Seq[String] =
    (0 until n).map { j =>
      val h = Mix31.mix(j.toLong)
      // Map the uniform hash onto a skewed rank: rank = h mod (j mod 97 + 1)
      // would be weird — instead use the classic trick: item = number of
      // trailing set bits buckets (geometric), giving item r frequency
      // ~ n / 2^(r+1).
      val r = java.lang.Long.numberOfTrailingZeros(~h)
      s"item_$r"
    }

  private def exactCounts(s: Seq[String]): Map[String, Long] =
    s.groupBy(identity).map { case (i, xs) => i -> xs.size.toLong }

  test("single-state MG: band and survivorship on a skewed stream") {
    val n = 20000
    val k = 8
    val s = stream(n)
    val truth = exactCounts(s)
    val m = mutable.HashMap.empty[String, Long]
    s.foreach(HeavyHitters.add(m, _, 1L, k))
    assert(m.size <= k)
    val bound = n.toLong / (k + 1)
    // Every item with true frequency > n/(k+1) must survive.
    truth.filter(_._2 > bound).keys.foreach { hot =>
      assert(m.contains(hot), s"lost heavy hitter $hot")
    }
    // Estimates are underestimates within the band.
    m.foreach { case (item, est) =>
      val t = truth(item)
      assert(est <= t, s"$item overestimated: $est > $t")
      assert(est >= t - bound, s"$item below band: $est < $t - $bound")
    }
  }

  test("merged MG keeps the additive band across partitions") {
    val n = 20000
    val k = 8
    val s = stream(n)
    val truth = exactCounts(s)
    val parts = s.grouped(n / 4 + 1).toSeq
    val states = parts.map { p =>
      val m = mutable.HashMap.empty[String, Long]
      p.foreach(HeavyHitters.add(m, _, 1L, k))
      m
    }
    val merged = states.reduce { (a, b) =>
      b.foreach { case (i, c) => a.updateWith(i) {
        case Some(x) => Some(x + c); case None => Some(c)
      } }
      HeavyHitters.shrink(a, k)
      a
    }
    assert(merged.size <= k)
    val bound = n.toLong / (k + 1) // mergeable-summaries: bound stays n/(k+1)
    truth.filter(_._2 > bound).keys.foreach { hot =>
      assert(merged.contains(hot), s"merge lost heavy hitter $hot")
    }
    merged.foreach { case (item, est) =>
      val t = truth.getOrElse(item, 0L)
      assert(est <= t && est >= t - bound, s"$item: est=$est true=$t")
    }
  }

  test("exact regime through SQL: distinct <= k gives exact counts") {
    import spark.implicits._
    HeavyHitters.register(spark)
    val df = Seq.tabulate(1000)(i => s"tok_${i % 7}").toDF("t")
      .repartition(4)
    val rows = df.selectExpr("mg_topk(t, 16) AS hh")
      .selectExpr("explode(hh) AS e").selectExpr("e.token", "e.est")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = (0 until 7).map(i => s"tok_$i" ->
      (1000 / 7 + (if (i < 1000 % 7) 1 else 0)).toLong).toMap
    assert(rows === want)
  }
}

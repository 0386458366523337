package graft

import org.apache.spark.sql.functions._

import graft.functions.{KmvSketch, Mix31}

class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  private def sketchOf(keys: Seq[Long], k: Int, partitions: Int): Seq[Long] = {
    KmvSketch.register(spark)
    keys.toDF("key").repartition(partitions)
      .agg(expr(s"kmv_sketch(key, $k)").as("sk"))
      .collect().head.getSeq[Long](0)
  }

  test("sketch is the k smallest distinct hashes, ascending") {
    val keys = (1L to 500L) ++ (1L to 250L) // duplicates must not matter
    val expected = keys.map(Mix31.mix).distinct.sorted.take(16)
    assert(sketchOf(keys, 16, 8) == expected)
  }

  test("sketch below k distinct IS the whole distinct hash set") {
    val keys = Seq(3L, 1L, 4L, 1L, 5L, 9L, 2L, 6L)
    val expected = keys.map(Mix31.mix).distinct.sorted
    assert(sketchOf(keys, 64, 4) == expected)
  }

  test("sketch is invariant under partitioning (merge replays hashes)") {
    val keys = (1L to 3000L).map(_ * 13 + 7)
    val a = sketchOf(keys, 128, 1)
    val b = sketchOf(keys, 128, 7)
    val c = sketchOf(keys, 128, 32)
    assert(a == b && b == c, "partition-dependent sketches")
  }

  test("nulls are ignored; empty input yields an empty sketch") {
    KmvSketch.register(spark)
    val sk = Seq[Option[Long]](None, None).toDF("key")
      .agg(expr("kmv_sketch(key, 8)")).collect().head.getSeq[Long](0)
    assert(sk.isEmpty)
  }

  test("estimator lands within the KMV error band past k") {
    // rsd ~= 1/sqrt(k-2) = 9% at k=128; allow 3 sigma.
    val k = 128
    for (n <- Seq(2000, 20000)) {
      val sk = sketchOf((1L to n.toLong), k, 16)
      assert(sk.size == k)
      val est = (k - 1).toLong * 2147483648L / sk.last
      assert(math.abs(est.toDouble / n - 1) < 0.27, s"n=$n est=$est")
    }
  }

  test("registered query: exact set algebra below k, banded estimates above") {
    val df = graft.ops.AnalyticsQueries.kmvSetOps(spark, Sf001)
    // Brute-force per-type distinct HASH sets of the same (user, day)
    // packing — the estimator's ground truth is hash-set cardinality
    // (a 31-bit collision merges two pairs in BOTH engines alike).
    val sets = graft.core.Sources.events(spark, Sf001)
      .select($"event_type",
        expr(Mix31.sparkSql("(user_id * 64 + day(ts))")).as("h"))
      .distinct().collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (sets(r.getString(0)), sets(r.getString(1)))
      val (exactU, exactI) = ((a | b).size.toLong, (a & b).size.toLong)
      val (nU, unionEst, interEst) =
        (r.getLong(2), r.getLong(4), r.getLong(5))
      if (nU < 256) { // exact regime: sketches are the whole sets
        assert(unionEst == exactU, s"$r vs exact union $exactU")
        assert(interEst == exactI, s"$r vs exact inter $exactI")
      } else {
        assert(math.abs(unionEst.toDouble / exactU - 1) < 0.27, s"$r")
        assert(math.abs(interEst - exactI).toDouble <=
          0.27 * exactU, s"$r vs exact inter $exactI")
      }
    }
  }
}

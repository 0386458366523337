package graft

import org.apache.spark.sql.functions._

import graft.llm.Packing

class PackingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val budget = 512L

  test("every doc is packed exactly once, tokens conserved") {
    val packed = Packing.pack(spark, dir, budget)
    val docs = graft.core.Sources.documents(spark, dir)
      .select(col("lang"),
        size(split(col("text"), " ")).cast("long").as("toks"))
    val expected = docs.groupBy("lang")
      .agg(count(lit(1)).as("n"), sum("toks").as("t"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val got = packed.groupBy("lang")
      .agg(sum("n_docs").as("n"), sum("shard_tokens").as("t"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got == expected)
  }

  test("shard loads are bounded by budget plus one straddling document") {
    val maxDoc = graft.core.Sources.documents(spark, dir)
      .agg(max(size(split(col("text"), " ")).cast("long")))
      .collect().head.getLong(0)
    val shards = Packing.pack(spark, dir, budget).collect()
    // Non-final shards carry at least one token past nothing — every shard
    // except a language's last must hold ≥ budget − maxDoc (else the next
    // doc would still have fit) and every shard < budget + maxDoc.
    val lastPerLang = shards.groupBy(_.getString(0)).view
      .mapValues(_.map(_.getLong(1)).max).toMap
    shards.foreach { r =>
      val (lang, shard, toks) =
        (r.getString(0), r.getLong(1), r.getAs[Long]("shard_tokens"))
      assert(toks < budget + maxDoc, s"$lang/$shard overflows: $toks")
      if (shard != lastPerLang(lang))
        assert(toks > budget - maxDoc, s"$lang/$shard underfilled: $toks")
    }
  }

  test("shard ids are contiguous from zero within each language") {
    val shards = Packing.pack(spark, dir, budget).collect()
    shards.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val ids = rs.map(_.getLong(1)).sorted
      assert(ids.head == 0L && ids.toSeq == (0L until ids.length).toSeq)
    }
  }

  test("bucketed: every doc packed once, tokens conserved, key is wider") {
    val packed = Packing.packBucketed(spark, dir, budget)
    val docs = graft.core.Sources.documents(spark, dir)
      .select(col("lang"),
        size(split(col("text"), " ")).cast("long").as("toks"))
    val expected = docs.groupBy("lang")
      .agg(count(lit(1)).as("n"), sum("toks").as("t"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val got = packed.groupBy("lang")
      .agg(sum("n_docs").as("n"), sum("shard_tokens").as("t"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got == expected)
    // The point of the bucketed form: strictly more window partitions than
    // languages, so packing parallelism is no longer capped at #languages.
    val keys = packed.select("lang", "bucket").distinct().count()
    val langs = packed.select("lang").distinct().count()
    assert(keys > langs, s"only $keys window keys over $langs languages")
  }

  test("bucketed: per-(lang,bucket) shard loads bounded, ids contiguous") {
    val maxDoc = graft.core.Sources.documents(spark, dir)
      .agg(max(size(split(col("text"), " ")).cast("long")))
      .collect().head.getLong(0)
    val shards = Packing.packBucketed(spark, dir, budget).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getAs[Long]("shard_tokens")))
    val byKey = shards.groupBy(t => (t._1, t._2))
    byKey.foreach { case ((lang, bkt), rs) =>
      val lastShard = rs.map(_._3).max
      rs.foreach { case (_, _, shard, toks) =>
        assert(toks < budget + maxDoc, s"$lang/$bkt/$shard overflows: $toks")
        if (shard != lastShard)
          assert(toks > budget - maxDoc,
            s"$lang/$bkt/$shard underfilled: $toks")
      }
      val ids = rs.map(_._3).sorted
      assert(ids.head == 0L && ids.toSeq == (0L until ids.length).toSeq)
    }
  }

  test("bucketed packing shuffles once: window partitioning feeds the agg") {
    // The scale claim in the scaladoc, asserted on the physical plan: the
    // window's hashpartitioning(lang, bucket) satisfies the follow-up
    // aggregation's clustered distribution on (lang, bucket, shard_id),
    // so there is exactly ONE exchange in the whole plan.
    val plan = Packing.packBucketed(spark, dir, budget)
      .queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllMatchIn(plan).length
    assert(shuffles == 1, s"expected exactly one exchange, got $shuffles:\n$plan")
  }

  test("bucketed ≡ plain packing when nBuckets = 1") {
    val plain = Packing.pack(spark, dir, budget)
      .select("lang", "shard_id", "n_docs", "shard_tokens")
      .collect().map(_.toSeq).toSet
    val one = Packing.packBucketed(spark, dir, budget, nBuckets = 1)
      .select("lang", "shard_id", "n_docs", "shard_tokens")
      .collect().map(_.toSeq).toSet
    assert(one == plain)
  }
}

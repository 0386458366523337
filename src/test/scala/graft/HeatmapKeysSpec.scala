package graft

import org.apache.spark.sql.functions._

import graft.functions.{Mix31, MinHashSignature}
import graft.ops.{Heatmap, SurrogateKeys}

/** Epoch-arithmetic heatmap coordinates and hash surrogate keys: known
  * calendar anchors, tiling, determinism, and the collision audit
  * actually firing on a constructed colliding pair. */
class HeatmapKeysSpec extends SparkSpec {

  import spark.implicits._

  test("dow/hour arithmetic hits known calendar anchors") {
    // 1970-01-01 (epoch day 0) was a Thursday → dow 4; 1970-01-05 the
    // following Monday → dow 1.  Hour from the second-of-day.
    val r = spark.sql(
      "SELECT (0 DIV 86400 + 3) % 7 + 1, (4 * 86400 DIV 86400 + 3) % 7 + 1," +
        " (86399 % 86400) DIV 3600, (3600 % 86400) DIV 3600")
      .collect()(0)
    assert(r.getLong(0) === 4L)
    assert(r.getLong(1) === 1L)
    assert(r.getLong(2) === 23L)
    assert(r.getLong(3) === 1L)
  }

  test("heatmap tiles the event log; coordinates stay on the grid") {
    val rows = Heatmap.dowHour(spark, Sf001).collect()
    val total = graft.core.Sources.events(spark, Sf001).count()
    assert(rows.map(_.getLong(2)).sum === total)
    rows.foreach { r =>
      assert(r.getInt(0) >= 1 && r.getInt(0) <= 7)
      assert(r.getInt(1) >= 0 && r.getInt(1) <= 23)
    }
  }

  test("surrogates are deterministic and match the scalar chain") {
    val a = SurrogateKeys.supplierSurrogates(spark, Sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = SurrogateKeys.supplierSurrogates(spark, Sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
    assert(a.values.toSet.size === a.size) // injective on this dim
    val names = graft.core.Sources.supplier(spark, Sf001)
      .select("s_suppkey", "s_name").as[(Long, String)].collect()
    names.foreach { case (k, n) =>
      assert(a(k) === Mix31.mix(MinHashSignature.tokenHash(n)), s"key $k")
    }
  }

  test("the collision audit fires on a genuinely colliding pair") {
    // A CONSTRUCTED char_poly collision (brute force would not find
    // one: poly over structured suffixes is quasi-injective below the
    // modulus).  The poly is linear in 131-powers, so pick character
    // deltas with Σ δⱼ·131^j ≡ 0 (mod 2³¹−1):
    //   +1·131⁵ + 0·131⁴ + 33·131³ + 59·131² + 125·131 + 118 = p.
    // Mix31 is a bijection on 31 bits, so the mixed surrogates collide
    // iff the polys do.
    val n1 = "AAAAAA"
    val n2 = new String(Array(66, 65, 98, 124, 190, 183).map(_.toChar))
    assert(n1 !== n2)
    assert(MinHashSignature.tokenHash(n1) === MinHashSignature.tokenHash(n2))
    assert(Mix31.mix(MinHashSignature.tokenHash(n1)) ===
      Mix31.mix(MinHashSignature.tokenHash(n2)))
    graft.functions.CharPolyHash.register(spark)
    val dim = Seq((1L, n1), (2L, n2)).toDF("s_suppkey", "s_name")
      .withColumn("surrogate",
        expr(Mix31.sparkSql("char_poly_hash(s_name)")))
    val audit = dim.agg(countDistinct(col("s_name")).as("n_names"),
      countDistinct(col("surrogate")).as("n_surrogates"))
    val ex = intercept[Exception] {
      dim.crossJoin(broadcast(audit))
        .filter(coalesce(expr(
          "assert_true(n_names = n_surrogates, 'surrogate collision')"),
          lit(true)))
        .collect()
    }
    assert(ex.getMessage != null)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.functions.MoneyCents

/** `money_cents` must be value-identical to the registry's canonical
  * spelling `CAST(CAST(d AS DECIMAL(18,2)) * 100 AS BIGINT)` on EVERY
  * double — the contract that lets engine-side plans adopt it while
  * every oracle keeps the Frag.money spelling. */
class MoneyCentsSpec extends SparkSpec {
  import spark.implicits._

  private val canonical = "CAST(CAST(d AS DECIMAL(18,2)) * 100 AS BIGINT)"

  private def compare(ds: Seq[java.lang.Double], label: String): Unit = {
    MoneyCents.register(spark)
    // LEGACY mode: the canonical Cast NULLs (instead of throwing) on the
    // adversarial overflow/NaN rows, which is the semantics money_cents
    // implements; on finite in-range money values (all the registry's
    // data) the two agree under either mode.
    withAnsi(false) {
      val df = ds.map(d => Option(d).map(_.doubleValue)).toDF("d")
        .repartition(3)
      val bad = df.selectExpr("d", "money_cents(d) AS fast",
          s"$canonical AS slow")
        .where("NOT (fast <=> slow)")
        .collect()
      assert(bad.isEmpty,
        s"$label: ${bad.take(5).mkString("; ")} (${bad.length} diverging)")
    }
  }

  test("exact 2-decimal money values (the fast path)") {
    val rnd = new scala.util.Random(42)
    compare(Seq.fill(20000)(
      java.lang.Double.valueOf(rnd.nextInt(2000000000).toDouble / 100.0)),
      "2dp")
    compare(Seq(0.0, -0.0, 0.01, -0.01, 1e9 + 0.25, -123456789.99)
      .map(java.lang.Double.valueOf), "edges")
  }

  test("adversarial doubles: >2-decimal shortest reprs and .005 halves") {
    val rnd = new scala.util.Random(7)
    compare(Seq.fill(20000)(
      java.lang.Double.valueOf(rnd.nextDouble() * 1e6 - 5e5)), "uniform")
    // True .005 boundaries: shortest repr is exactly 3 decimals ending
    // in 5, where HALF_UP and any naive double-rounding diverge.
    compare((-999 to 999).map(i =>
      java.lang.Double.valueOf(i.toDouble / 1000.0 * 5)), "halves")
    compare(Seq("0.005", "0.015", "-0.005", "2.675", "1.005", "1234.565")
      .map(s => java.lang.Double.valueOf(s.toDouble)), "classic halves")
  }

  test("fast-path ceiling, overflow, non-finite, NULL") {
    val big = MoneyCents.FastMax.toDouble / 100.0
    compare(Seq(big - 1, big, big + 1, big * 1.7, 1e15, 9.99e15,
      // DECIMAL(18,2) overflow -> NULL in both spellings
      1e17, -1e17, 1e300,
      Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity)
      .map(java.lang.Double.valueOf), "ceiling")
    compare(Seq[java.lang.Double](null, java.lang.Double.valueOf(1.25), null),
      "nulls")
  }

  test("random bit patterns (full double domain)") {
    val rnd = new scala.util.Random(13)
    compare(Seq.fill(20000) {
      val d = java.lang.Double.longBitsToDouble(rnd.nextLong())
      java.lang.Double.valueOf(d)
    }, "bits")
  }

  test("scale-0 form matches CAST(CAST(d AS DECIMAL(18,0)) AS BIGINT)") {
    MoneyCents.register(spark)
    val rnd = new scala.util.Random(99)
    val vs = Seq.fill(20000)(rnd.nextDouble() * 1e7 - 5e6) ++
      Seq.tabulate(2001)(i => (i - 1000).toDouble / 2.0) ++ // exact .5 halves
      Seq(1e16, -1e16, 1e300, Double.NaN, Double.PositiveInfinity)
    withAnsi(false) {
      val bad = vs.toDF("d")
        .selectExpr("d", "money_cents(d, 0) AS fast",
          "CAST(CAST(d AS DECIMAL(18,0)) AS BIGINT) AS slow")
        .where("NOT (fast <=> slow)").collect()
      assert(bad.isEmpty, bad.take(5).mkString("; "))
    }
  }

  test("agrees on the real lineitem money column and stays codegen'd") {
    MoneyCents.register(spark)
    val li = spark.read.parquet(s"$Sf001/lineitem.parquet")
    val bad = li.selectExpr("money_cents(l_extendedprice) AS fast",
        s"CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS slow")
      .where("NOT (fast <=> slow)").count()
    assert(bad === 0L)
    val df = li.selectExpr("money_cents(l_extendedprice) AS c")
      .groupBy().agg(sum("c"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) HashAggregate""".r.findFirstIn(plan).isDefined, plan)
  }
}

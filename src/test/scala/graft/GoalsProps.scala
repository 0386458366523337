package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.SparkSession

import graft.ops.Goals

/** Property checks for the goal math: the engine's basis-point percentage
  * equals exact rational arithmetic truncated at 4 digits, and the net
  * commission invariant comissao_liquida = comissao_bruta × 0.805 holds
  * through the shared fragments (SURVEY.md §5 item 3). */
object GoalsProps extends Properties("Goals") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    // keep in sync with SparkSpec: getOrCreate may CREATE the JVM-wide
    // session here, and later suites read events.parquet through it
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val cents: Gen[Long] = Gen.choose(1L, 5000000L) // 0.01 .. 50k

  property("pct equals exact rational truncated at basis points") =
    forAll(cents, cents) { (xc, mc) =>
      import spark.implicits._
      val df = Seq((BigDecimal(xc) / 100, BigDecimal(mc) / 100))
        .toDF("achieved", "target")
      val got = df.selectExpr(Goals.pct("achieved", "target", Goals.SparkDiv))
        .as[Double].head()
      val expected = ((BigInt(10000) * BigInt(xc)) / BigInt(mc)).toDouble / 100
      got == expected
    }

  property("comissao_liquida = comissao_bruta * 0.805 exactly") =
    forAll(cents) { bc =>
      import spark.implicits._
      val df = Seq(BigDecimal(bc) / 100).toDF("comissao_bruta")
      val got = df.selectExpr(
        graft.core.Frag.asMoney(s"comissao_bruta * ${graft.core.Rates.Net}"))
        .as[BigDecimal].head()
      val expected = (BigDecimal(bc) * BigDecimal("0.805") / 100)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)
      got == expected
    }
}

package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (getOrCreate reuses the one
  * JVM-wide session across suites in the forked test JVM). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true") // events TIMESTAMP(NANOS)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val Sf001 = "/root/testdata/sf0.001"

  /** Build-and-restore around `spark.sql.ansi.enabled`: evalMode is
    * captured at ANALYSIS time, so the conf must hold while the plan
    * under test is constructed (the kernel rewrite rules fire only on
    * LEGACY arithmetic — see VecDotRewrite/VecDist2Rewrite). */
  def withAnsi[T](on: Boolean)(f: => T): T = {
    val key = "spark.sql.ansi.enabled"
    val before = spark.conf.get(key)
    spark.conf.set(key, on.toString)
    try f finally spark.conf.set(key, before)
  }
}

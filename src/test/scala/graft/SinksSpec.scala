package graft

import java.nio.file.Files

import graft.core.Sinks

/** The reference's idempotency contract (S4-S7): re-running a load replaces
  * exactly the affected keys — run-twice ≡ run-once, untouched keys
  * survive a keyed reload. */
class SinksSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_sink").toString

  test("overwriteAll: run-twice equals run-once") {
    val path = tmp()
    val df = Seq((1, "a"), (2, "b")).toDF("k", "v")
    Sinks.overwriteAll(df, path)
    Sinks.overwriteAll(df, path)
    val got = spark.read.parquet(path).as[(Int, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1, "a"), (2, "b")))
  }

  test("overwriteByKey replaces only the keys present in the new frame") {
    val path = tmp()
    Sinks.overwriteByKey(
      Seq((1, "jan"), (2, "feb")).toDF("mes", "v"), path, Seq("mes"))
    // Reload month 2 with new content; month 1 must survive (the
    // reference's DELETE WHERE mes=%s semantics).
    Sinks.overwriteByKey(
      Seq((2, "feb_v2")).toDF("mes", "v"), path, Seq("mes"))
    val got = spark.read.parquet(path)
      .select("mes", "v").as[(Int, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1, "jan"), (2, "feb_v2")))
  }

  test("overwriteByKey: run-twice equals run-once") {
    val path = tmp()
    val df = Seq((1, "x"), (2, "y")).toDF("mes", "v")
    Sinks.overwriteByKey(df, path, Seq("mes"))
    Sinks.overwriteByKey(df, path, Seq("mes"))
    assert(spark.read.parquet(path).count() == 2)
  }
}

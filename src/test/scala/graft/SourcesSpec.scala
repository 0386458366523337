package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.core.Sources

/** Landing-format plurality: the same rows come back from CSV and
  * JSON-lines ingestion as from the parquet star schema, under an explicit
  * schema (never inference — see the Sources scaladoc), and malformed
  * records surface instead of failing the scan. */
class SourcesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString + "/out"

  test("CSV round-trips the documents metadata against parquet truth") {
    val truth = Sources.documents(spark, dir)
      .select("doc_id", "lang", "source", "n_chars")
    val path = tmp("graft_csv")
    truth.write.option("header", "true").csv(path)
    val back = Sources.csv(spark, path, docSchema)
    assert(back.exceptAll(truth).isEmpty && truth.exceptAll(back).isEmpty)
  }

  test("JSON-lines round-trips including the full text column") {
    val truth = Sources.documents(spark, dir)
      .select("doc_id", "lang", "text")
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("lang", StringType),
      StructField("text", StringType)))
    val path = tmp("graft_json")
    truth.write.json(path)
    val back = Sources.jsonLines(spark, path, schema)
    assert(back.exceptAll(truth).isEmpty && truth.exceptAll(back).isEmpty)
  }

  test("malformed JSON rows surface as corrupt records, not job failures") {
    import spark.implicits._
    val path = tmp("graft_badjson")
    Seq("""{"doc_id": 1, "lang": "en"}""", """not json at all""")
      .toDF("value").coalesce(1).write.text(path)
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("lang", StringType),
      StructField("_corrupt_record", StringType)))
    val got = Sources.jsonLines(spark, path, schema).cache()
    try {
      assert(got.count() == 2)
      assert(got.filter(col("_corrupt_record").isNotNull).count() == 1)
      assert(got.filter(col("doc_id") === 1L && col("lang") === "en")
        .count() == 1)
    } finally got.unpersist()
  }
}

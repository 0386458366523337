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

  // The JDBC swap the Sources scaladoc documents, proven end-to-end
  // against embedded in-memory Derby (in-process, no sockets — the only
  // JDBC engine on the sandbox classpath; executors are threads in this
  // JVM, so the memory: database is visible to every task).
  private def derbyUrl = "jdbc:derby:memory:graftdb;create=true"

  private def seedDerby(): Unit = {
    val conn = java.sql.DriverManager.getConnection(derbyUrl)
    try {
      val st = conn.createStatement()
      try st.execute("DROP TABLE clients") catch { case _: Exception => }
      st.execute(
        "CREATE TABLE clients (id BIGINT, name VARCHAR(32), saldo DOUBLE)")
      val ps = conn.prepareStatement("INSERT INTO clients VALUES (?, ?, ?)")
      (1L to 100L).foreach { i =>
        ps.setLong(1, i); ps.setString(2, s"client_$i")
        ps.setDouble(3, i * 1.5); ps.addBatch()
      }
      ps.executeBatch()
    } finally conn.close()
  }

  test("JDBC source reads an embedded Derby table with its schema") {
    seedDerby()
    val df = Sources.jdbc(spark, derbyUrl, "clients")
    assert(df.schema.fieldNames.map(_.toLowerCase).toSeq ==
      Seq("id", "name", "saldo"))
    assert(df.count() == 100)
    // Predicate pushdown reaches the remote engine: the filtered count is
    // computed by Derby, not by scanning all rows into Spark.
    assert(df.filter(col("ID") <= 10).count() == 10)
  }

  test("partitioned JDBC read splits into disjoint parallel range queries") {
    seedDerby()
    val df = Sources.jdbcPartitioned(spark, derbyUrl, "clients",
      partitionColumn = "ID", lowerBound = 1L, upperBound = 101L,
      numPartitions = 4)
    assert(df.rdd.getNumPartitions == 4)
    // Ranges are disjoint and exhaustive: no row lost or duplicated.
    assert(df.count() == 100)
    assert(df.agg(sum(col("ID"))).collect().head.getLong(0) == 5050L)
  }
}

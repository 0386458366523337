package graft

import java.sql.DriverManager

import org.apache.spark.sql.functions.col

import graft.core.{JdbcEnv, Sinks, SqlDialect}

/** Executes the WHOLE Postgres load path — `Sinks.overwriteByKeyJdbc`'s
  * staged DELETE-WHERE-EXISTS/INSERT transaction, `overwriteAllJdbc`,
  * `mergeJdbc`'s native ON CONFLICT statement, and `appendBatchJdbc`'s
  * ledger transaction — against a real engine that parses the pinned
  * Postgres statement text: DuckDB over JDBC (r11 verdict "extend
  * real-engine Postgres execution beyond upsert"; PgUpsertSpec covers the
  * statement text in isolation, this spec drives the production entry
  * points end-to-end, Spark JDBC writer included, via
  * `JdbcEnv.dialectOverride = Postgres`).
  *
  * The reference semantics under test are `kpi_receita_farmer_m_passado/
  * load.py:44-83`: DELETE the target rows for the batch's keys, then
  * insert the batch, on one transaction.
  *
  * DuckDB is ALSO the extreme portability fixture: no SAVEPOINT, no
  * `ALTER TABLE ADD CONSTRAINT`, statements close on error, and unique
  * violations carry a null SQLSTATE — so this spec is what proves the
  * savepoint-optional / fresh-statement forms of ensureLedger and
  * upsertOrFallback actually run on an engine with none of Derby's
  * affordances.  Cancels (never fails) if the driver jar is absent. */
class PgExecSpec extends SparkSpec {
  import spark.implicits._

  /** Spark-side (not Sinks-side) dialect shim: Spark's JDBC writer
    * classifies a failed `tableExists` probe via
    * `JdbcDialect.isObjectNotFoundException`, whose default reads
    * SQLSTATEs — and DuckDB's driver reports null SQLSTATEs, so the
    * bootstrap probe RETHROWS instead of returning false.  Message-match
    * is all the classification DuckDB supports.  Test-scoped: production
    * targets (Postgres) have real Spark dialects. */
  private object DuckDbSparkDialect
      extends org.apache.spark.sql.jdbc.JdbcDialect {
    override def canHandle(url: String): Boolean =
      url.startsWith("jdbc:duckdb")
    override def isObjectNotFoundException(
        e: java.sql.SQLException): Boolean =
      Option(e.getMessage).exists(_.contains("does not exist"))
  }

  private def withDuckEnv(f: (JdbcEnv, java.sql.Statement) => Unit): Unit = {
    val loaded =
      try { Class.forName("org.duckdb.DuckDBDriver"); true }
      catch { case _: ClassNotFoundException => false }
    assume(loaded, "duckdb_jdbc not on the test classpath")
    // Register for THIS test body only and always unregister (the TxLogSpec
    // claim-scheme pattern): JdbcDialects is production-global mutable
    // state, and a dialect left behind would shadow any later registrant
    // for jdbc:duckdb URLs.
    org.apache.spark.sql.jdbc.JdbcDialects.registerDialect(DuckDbSparkDialect)
    try {
      // File-backed, not jdbc:duckdb: — every connection to the in-memory
      // URL gets its OWN private database, and the load path opens several
      // (driver transaction + Spark writer).
      val db = java.nio.file.Files.createTempDirectory("pgexec")
        .resolve("pg.duckdb").toString
      val env = JdbcEnv(s"jdbc:duckdb:$db", None, None,
        dialectOverride = Some(SqlDialect.Postgres))
      val conn = DriverManager.getConnection(env.url)
      try {
        val st = conn.createStatement()
        try f(env, st) finally st.close()
      } finally conn.close()
    } finally {
      org.apache.spark.sql.jdbc.JdbcDialects.unregisterDialect(DuckDbSparkDialect)
    }
  }

  private def snap(st: java.sql.Statement, sql: String): Seq[Seq[Any]] = {
    val rs = st.executeQuery(sql)
    val n = rs.getMetaData.getColumnCount
    val out = Seq.newBuilder[Seq[Any]]
    while (rs.next()) out += (1 to n).map(rs.getObject(_))
    rs.close(); out.result()
  }

  test("overwriteByKeyJdbc: staged delete/insert transaction runs on Postgres text") {
    withDuckEnv { (env, st) =>
      // repartition(1): one writer connection — this spec tests the swap
      // transaction, not DuckDB's optimistic append concurrency.
      val v1 = Seq((7L, "2024-01", 100L), (7L, "2024-02", 110L),
        (9L, "2024-01", 900L)).toDF("farmer_id", "mes", "receita")
        .repartition(1)
      Sinks.overwriteByKeyJdbc(v1, env, "kpi_farmer", Seq("farmer_id"))
      assert(snap(st, "SELECT count(*) FROM kpi_farmer") == Seq(Seq(3L)))
      // Reload farmer 7 with ONE row: the whole key group is replaced
      // (the load.py delete-then-insert contract), farmer 9 untouched.
      val v2 = Seq((7L, "2024-03", 120L)).toDF("farmer_id", "mes", "receita")
        .repartition(1)
      Sinks.overwriteByKeyJdbc(v2, env, "kpi_farmer", Seq("farmer_id"))
      val after = snap(st,
        "SELECT \"farmer_id\", \"mes\", \"receita\" FROM kpi_farmer ORDER BY 1, 2")
      assert(after == Seq(Seq(7L, "2024-03", 120L), Seq(9L, "2024-01", 900L)))
      // Run-twice ≡ run-once.
      Sinks.overwriteByKeyJdbc(v2, env, "kpi_farmer", Seq("farmer_id"))
      assert(snap(st,
        "SELECT \"farmer_id\", \"mes\", \"receita\" FROM kpi_farmer ORDER BY 1, 2")
        == after)
      // No staging table survives any path.
      assert(snap(st, "SELECT count(*) FROM information_schema.tables " +
        "WHERE table_name LIKE 'kpi_farmer_stg%'") == Seq(Seq(0L)))
    }
  }

  test("overwriteAllJdbc: full reload swaps old for new in one transaction") {
    withDuckEnv { (env, st) =>
      val v1 = Seq((1L, 10L), (2L, 20L)).toDF("k", "v").repartition(1)
      Sinks.overwriteAllJdbc(v1, env, "full_tgt")
      val v2 = Seq((3L, 30L)).toDF("k", "v").repartition(1)
      Sinks.overwriteAllJdbc(v2, env, "full_tgt")
      assert(snap(st, "SELECT \"k\", \"v\" FROM full_tgt") == Seq(Seq(3L, 30L)))
    }
  }

  test("mergeJdbc: the native ON CONFLICT statement executes through the sink") {
    withDuckEnv { (env, st) =>
      val v1 = Seq((1L, "old"), (2L, "keep")).toDF("k", "v").repartition(1)
      Sinks.mergeJdbc(v1, env, "merge_tgt", Seq("k"))
      // Bootstrap created the unique index, so this second merge takes the
      // native upsert (no fallback available to hide behind: a failed
      // ON CONFLICT on DuckDB would close the statement and the fallback
      // would still produce the same rows — assert the index exists to
      // pin which path armed).
      assert(snap(st, "SELECT count(*) FROM duckdb_indexes() " +
        "WHERE table_name = 'merge_tgt' AND is_unique") == Seq(Seq(1L)))
      val v2 = Seq((1L, "new"), (3L, "ins")).toDF("k", "v").repartition(1)
      Sinks.mergeJdbc(v2, env, "merge_tgt", Seq("k"))
      assert(snap(st, "SELECT \"k\", \"v\" FROM merge_tgt ORDER BY 1") ==
        Seq(Seq(1L, "new"), Seq(2L, "keep"), Seq(3L, "ins")))
    }
  }

  test("appendBatchJdbc: exactly-once ledger transaction without savepoints") {
    withDuckEnv { (env, st) =>
      val b0 = Seq((1L, "a")).toDF("k", "v").repartition(1)
      assert(Sinks.appendBatchJdbc(b0, env, "led_tgt", "app", 0L))
      // Replay of a committed batch is SKIPPED, not re-applied.
      assert(!Sinks.appendBatchJdbc(b0, env, "led_tgt", "app", 0L))
      val b1 = Seq((2L, "b")).toDF("k", "v").repartition(1)
      assert(Sinks.appendBatchJdbc(b1, env, "led_tgt", "app", 1L))
      assert(snap(st, "SELECT \"k\", \"v\" FROM led_tgt ORDER BY 1") ==
        Seq(Seq(1L, "a"), Seq(2L, "b")))
      // The ledger committed in the SAME transaction as each batch, and
      // carries the UNIQUE replay backstop from CREATE TABLE (DuckDB has
      // no ADD CONSTRAINT; the constraint rides the creation).
      assert(snap(st,
        "SELECT app_id, batch_id FROM led_tgt_graft_ledger ORDER BY 2") ==
        Seq(Seq("app", 0L), Seq("app", 1L)))
      // Own statement: DuckDB closes a Statement object on error, and st
      // is still needed for the assertions below.
      val dup = st.getConnection.createStatement()
      try intercept[java.sql.SQLException] {
        dup.executeUpdate(
          "INSERT INTO led_tgt_graft_ledger VALUES ('app', 1)")
      } finally dup.close()
      // A failing batch rolls back target AND ledger together.
      val bad = Seq((3L, "c")).toDF("k", "v")
        .withColumn("extra", col("k")) // schema mismatch vs target
        .repartition(1)
      intercept[Throwable] {
        Sinks.appendBatchJdbc(bad, env, "led_tgt", "app", 2L)
      }
      assert(snap(st, "SELECT count(*) FROM led_tgt") == Seq(Seq(2L)))
      assert(snap(st, "SELECT count(*) FROM led_tgt_graft_ledger") ==
        Seq(Seq(2L)))
    }
  }
}

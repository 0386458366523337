package graft

import java.sql.DriverManager

import org.scalatest.funsuite.AnyFunSuite

import graft.core.SqlDialect

/** Executes the PINNED Postgres dialect statements against a real engine
  * that implements Postgres's `INSERT ... ON CONFLICT` — DuckDB via its
  * JDBC driver (present in the build's offline jar cache; this is the
  * closest thing to a Postgres wire this zero-egress sandbox can run,
  * r9/r10 advice item "Postgres fast path").  DialectSpec pins the
  * statement TEXT; this spec proves the text parses and has the intended
  * semantics — upsert updates matched keys and inserts the rest in one
  * statement, the unique index arms it, and the delete-matching /
  * insert-from-staging pair (the portable fallback) agrees with it.
  * Derby cannot run any of this (no upsert), which is why the r8-r10
  * rounds could only pin text.  Cancels (never fails) if the driver jar
  * is absent. */
class PgUpsertSpec extends AnyFunSuite {

  private def withDuck(f: java.sql.Statement => Unit): Unit = {
    val loaded =
      try { Class.forName("org.duckdb.DuckDBDriver"); true }
      catch { case _: ClassNotFoundException => false }
    assume(loaded, "duckdb_jdbc not on the test classpath")
    val conn = DriverManager.getConnection("jdbc:duckdb:")
    try {
      val st = conn.createStatement()
      try f(st) finally st.close()
    } finally conn.close()
  }

  private val pg = SqlDialect.Postgres

  private def seed(st: java.sql.Statement): Unit = {
    st.executeUpdate("CREATE TABLE tgt (\"k\" BIGINT, \"v\" VARCHAR, \"n\" BIGINT)")
    st.executeUpdate("CREATE TABLE stg (\"k\" BIGINT, \"v\" VARCHAR, \"n\" BIGINT)")
    st.executeUpdate("INSERT INTO tgt VALUES (1, 'old', 10), (2, 'keep', 20)")
    st.executeUpdate("INSERT INTO stg VALUES (1, 'new', 11), (3, 'ins', 30)")
  }

  private def snap(st: java.sql.Statement, table: String): Seq[(Long, String, Long)] = {
    val rs = st.executeQuery(s"SELECT \"k\", \"v\", \"n\" FROM $table ORDER BY 1")
    val out = Seq.newBuilder[(Long, String, Long)]
    while (rs.next()) out += ((rs.getLong(1), rs.getString(2), rs.getLong(3)))
    rs.close(); out.result()
  }

  test("ON CONFLICT upsert executes: update matched, insert new, one statement") {
    withDuck { st =>
      seed(st)
      // The unique index createUniqueIndex emits is what arms ON CONFLICT.
      st.executeUpdate(pg.createUniqueIndex("tgt", Seq("k")))
      val sql = pg.upsertFromStaging("tgt", "stg", Seq("k"),
        Seq("k", "v", "n")).get
      st.executeUpdate(sql)
      assert(snap(st, "tgt") ==
        Seq((1L, "new", 11L), (2L, "keep", 20L), (3L, "ins", 30L)))
      // Idempotent: replaying the same staged batch changes nothing.
      st.executeUpdate(sql)
      assert(snap(st, "tgt") ==
        Seq((1L, "new", 11L), (2L, "keep", 20L), (3L, "ins", 30L)))
    }
  }

  test("all-key tables degrade to DO NOTHING (nothing non-key to update)") {
    withDuck { st =>
      st.executeUpdate("CREATE TABLE tk (\"k\" BIGINT)")
      st.executeUpdate("CREATE TABLE sk (\"k\" BIGINT)")
      st.executeUpdate(pg.createUniqueIndex("tk", Seq("k")))
      st.executeUpdate("INSERT INTO tk VALUES (1)")
      st.executeUpdate("INSERT INTO sk VALUES (1), (2)")
      val sql = pg.upsertFromStaging("tk", "sk", Seq("k"), Seq("k")).get
      assert(sql.endsWith("DO NOTHING"))
      st.executeUpdate(sql)
      val rs = st.executeQuery("SELECT COUNT(*), MAX(\"k\") FROM tk")
      rs.next(); assert((rs.getLong(1), rs.getLong(2)) == ((2L, 2L)))
    }
  }

  test("delete-matching + insert (the portable fallback) equals the native upsert") {
    withDuck { st =>
      seed(st)
      st.executeUpdate(
        pg.deleteMatching("tgt", "stg", Seq("k"), stringCols = Set.empty))
      st.executeUpdate(pg.insertFromStaging("tgt", "stg", Seq("k", "v", "n")))
      assert(snap(st, "tgt") ==
        Seq((1L, "new", 11L), (2L, "keep", 20L), (3L, "ins", 30L)))
    }
  }

  test("string keys compare directly on the Postgres dialect (TEXT, no cast)") {
    withDuck { st =>
      st.executeUpdate("CREATE TABLE ts (\"id\" VARCHAR, \"v\" BIGINT)")
      st.executeUpdate("CREATE TABLE ss (\"id\" VARCHAR, \"v\" BIGINT)")
      st.executeUpdate(pg.createUniqueIndex("ts", Seq("id")))
      st.executeUpdate("INSERT INTO ts VALUES ('a', 1)")
      st.executeUpdate("INSERT INTO ss VALUES ('a', 2), ('b', 3)")
      st.executeUpdate(pg.upsertFromStaging("ts", "ss", Seq("id"),
        Seq("id", "v")).get)
      val rs = st.executeQuery("SELECT \"v\" FROM ts ORDER BY \"id\"")
      val vs = Seq.newBuilder[Long]
      while (rs.next()) vs += rs.getLong(1)
      assert(vs.result() == Seq(2L, 3L))
    }
  }
}

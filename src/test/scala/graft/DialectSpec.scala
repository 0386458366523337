package graft

import graft.core.SqlDialect

/** Pins the SQL text each dialect emits for the transactional JDBC load
  * path (Sinks.overwriteByKeyJdbc / overwriteAllJdbc).  Derby is executed
  * for real by SinksSpec; Postgres — the reference's actual target
  * (`utils/db_connection.py`) — cannot run in the zero-egress sandbox, so
  * its statements are pinned here exactly: quoting, the absence of the
  * CLOB cast, and the ON CONFLICT upsert are the dialect-specific corners
  * that would break at first contact with a real server. */
class DialectSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("URL resolution matches Spark's own dialect dispatch") {
    assert(SqlDialect.forUrl("jdbc:postgresql://h:5432/db") == SqlDialect.Postgres)
    assert(SqlDialect.forUrl("jdbc:derby:memory:x;create=true") == SqlDialect.Derby)
    // Unknown URLs FAIL FAST (r8 ADVICE #5): the old Derby fallback's
    // VARCHAR(32672) casts are not portable SQL, so raw DDL/DML must not
    // be pointed at an engine whose dialect was never proven.
    val e = intercept[IllegalArgumentException] {
      SqlDialect.forUrl("jdbc:h2:mem:x")
    }
    assert(e.getMessage.contains("jdbc:h2:mem:x"))
    assert(e.getMessage.contains("jdbc:postgresql"))
  }

  test("unique-index DDL: quoted, schema-stripped name, 63-byte cap") {
    // Issued when mergeJdbc bootstraps a missing target (r8 ADVICE #1):
    // Postgres ON CONFLICT (keys) needs a matching unique index, and
    // Spark's JDBC bootstrap creates none.
    assert(SqlDialect.Postgres.createUniqueIndex(
      "analysis.fechamento", Seq("mes", "farmer_id")) ==
      """CREATE UNIQUE INDEX "ux_fechamento_mes_farmer_id" """ +
      """ON analysis.fechamento ("mes", "farmer_id")""")
    // Identifier stays within Postgres's 63-byte limit however long the
    // table/key names run.
    val long = SqlDialect.Postgres.createUniqueIndex(
      "a_really_quite_long_table_name_for_the_warehouse",
      Seq("first_key_column", "second_key_column", "third_key_column"))
    val name = long.split('"')(1)
    assert(name.length <= 63 && name.startsWith("ux_"))
    // Dialect-invariant text (Derby executes the same DDL in SinksSpec).
    assert(SqlDialect.Derby.createUniqueIndex("t", Seq("k")) ==
      """CREATE UNIQUE INDEX "ux_t_k" ON t ("k")""")
  }

  test("Postgres delete-matching: quoted idents, direct TEXT key comparison") {
    val sql = SqlDialect.Postgres.deleteMatching(
      "analysis.receita_farmer_m_passado", "stg", Seq("farmer_id", "fonte"),
      stringCols = Set("fonte"))
    assert(sql ==
      """DELETE FROM analysis.receita_farmer_m_passado t WHERE EXISTS """ +
      """(SELECT 1 FROM stg s WHERE s."farmer_id" = t."farmer_id" AND """ +
      """s."fonte" = t."fonte")""")
    // Postgres TEXT compares directly — no cast even for string keys.
    assert(!sql.contains("CAST"))
  }

  test("Derby delete-matching casts string keys out of CLOB") {
    val sql = SqlDialect.Derby.deleteMatching(
      "t1", "stg", Seq("farmer_id", "fonte"), stringCols = Set("fonte"))
    assert(sql.contains("""s."farmer_id" = t."farmer_id""""))
    assert(sql.contains("""CAST(s."fonte" AS VARCHAR(32672)) = """ +
      """CAST(t."fonte" AS VARCHAR(32672))"""))
  }

  test("insert-from-staging and delete-all are dialect-invariant ANSI") {
    for (d <- Seq(SqlDialect.Postgres, SqlDialect.Derby)) {
      assert(d.insertFromStaging("tgt", "stg", Seq("a", "b")) ==
        """INSERT INTO tgt ("a", "b") SELECT "a", "b" FROM stg""")
      assert(d.deleteAll("tgt") == "DELETE FROM tgt")
      assert(d.dropTable("stg") == "DROP TABLE stg")
    }
  }

  test("Postgres upsert: ON CONFLICT on the keys, EXCLUDED for non-keys") {
    val sql = SqlDialect.Postgres.upsertFromStaging(
      "tgt", "stg", Seq("mes", "farmer_id"),
      Seq("mes", "farmer_id", "receita_bruta", "fonte"))
    assert(sql.exists(_.contains("""INSERT INTO tgt ("mes", "farmer_id", """ +
      """"receita_bruta", "fonte") SELECT""")))
    assert(sql.exists(_.contains(
      """ON CONFLICT ("mes", "farmer_id") DO UPDATE SET """ +
      """"receita_bruta" = EXCLUDED."receita_bruta", """ +
      """"fonte" = EXCLUDED."fonte"""")))
    // All-key tables degrade to DO NOTHING, and Derby has no native upsert.
    assert(SqlDialect.Postgres.upsertFromStaging("t", "s", Seq("k"), Seq("k"))
      .exists(_.endsWith("ON CONFLICT (\"k\") DO NOTHING")))
    assert(SqlDialect.Derby.upsertFromStaging("t", "s", Seq("k"), Seq("k", "v"))
      .isEmpty)
  }
}

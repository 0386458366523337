package graft

import java.time.LocalDate

import graft.core.{JdbcEnv, RunConfig}

/** The reference's `.env`-driven config surface (S2:
  * `utils/db_connection.py:18-58`) mapped onto JDBC options + run params. */
class EnvConfigSpec extends org.scalatest.funsuite.AnyFunSuite {

  private val full = Map(
    "DB_HOST" -> "dbhost", "DB_PORT" -> "5432", "DB_NAME" -> "gamma",
    "DB_USER" -> "etl", "DB_PASSWORD" -> "secret")

  test("builds a Postgres URL with the default search_path as currentSchema") {
    val env = JdbcEnv.fromEnv(full)
    // The reference defaults DB_OPTIONS to '-c search_path=gammadata'.
    assert(env.url == "jdbc:postgresql://dbhost:5432/gamma?currentSchema=gammadata")
    assert(env.options("user") == "etl")
    assert(env.options("password") == "secret")
    // Credentials never ride in the URL (they would leak into plans/logs).
    assert(!env.url.contains("secret") && !env.url.contains("etl"))
  }

  test("DB_OPTIONS search_path override and absence") {
    assert(JdbcEnv.fromEnv(full + ("DB_OPTIONS" -> "-c search_path=analysis"))
      .url.endsWith("?currentSchema=analysis"))
    assert(JdbcEnv.fromEnv(full + ("DB_OPTIONS" -> "-c statement_timeout=0"))
      .url == "jdbc:postgresql://dbhost:5432/gamma")
  }

  test("missing variables fail loudly, naming every absent key") {
    val e = intercept[IllegalArgumentException] {
      JdbcEnv.fromEnv(Map("DB_HOST" -> "h", "DB_PORT" -> "", "DB_NAME" -> "d"))
    }
    // The reference raises listing the missing configs; empty counts as
    // missing (db_connection.py:39-41).
    assert(e.getMessage.contains("DB_PORT"))
    assert(e.getMessage.contains("DB_USER"))
    assert(e.getMessage.contains("DB_PASSWORD"))
    assert(!e.getMessage.contains("DB_HOST"))
  }

  test("DB_URL short-circuits derivation (the embedded-Derby test path)") {
    val env = JdbcEnv.fromEnv(Map("DB_URL" -> "jdbc:derby:memory:x;create=true"))
    assert(env.url == "jdbc:derby:memory:x;create=true")
    assert(env.options == Map("url" -> "jdbc:derby:memory:x;create=true"))
  }

  test("RunConfig.fromEnv: run params with pipeline-pinned defaults") {
    val cfg = RunConfig.fromEnv(Map(
      "GRAFT_RUN_DATE" -> "2001-03-15", "GRAFT_MONTHS_BACK" -> "5",
      "GRAFT_FARMER_ID" -> "7"))
    assert(cfg.runDate == LocalDate.of(2001, 3, 15))
    assert(cfg.monthsBack == 5 && cfg.farmerId.contains(7))
    val dflt = RunConfig.fromEnv(Map("GRAFT_FARMER_ID" -> ""))
    assert(dflt == RunConfig.default) // empty ≡ unset, like the reference
  }
}

package graft.core

/** Target-database dialect for the transactional JDBC load path.
  *
  * The reference loads into Postgres (`utils/db_connection.py:18-58`; every
  * pipeline's `load.py` issues Postgres-flavored DELETE/INSERT), while the
  * zero-egress build environment can only EXECUTE against embedded Derby —
  * and the two differ in exactly the raw-SQL corners a sink touches
  * (identifier quoting survives both, but Derby maps Spark `StringType` to
  * CLOB, whose equality comparison needs a VARCHAR cast, and Derby has no
  * `ON CONFLICT` upsert).  This trait isolates every dialect-specific SQL
  * string [[Sinks.overwriteByKeyJdbc]] emits, so the Postgres text is
  * pinned by unit test (DialectSpec) even though only Derby can run here,
  * and pointing the sink at the reference's actual database is a URL
  * change, not a code change.
  *
  * All statements reference columns QUOTED — Spark's JDBC writer creates
  * them case-preserved — and pass table names through verbatim (they may
  * carry a schema qualifier like the reference's `analysis.receita_...`).
  */
sealed trait SqlDialect {
  def name: String

  /** Quote an identifier exactly the way Spark's JDBC writer created it. */
  def quote(ident: String): String = "\"" + ident + "\""

  /** Reference a key column of `alias` in a comparison.  `isString` marks
    * columns Spark wrote as `StringType` — dialects whose string mapping
    * is not directly comparable override this. */
  def keyRef(alias: String, column: String, isString: Boolean): String =
    s"$alias.${quote(column)}"

  /** One-transaction member 1: delete target rows whose key appears in
    * staging (set-based `WHERE EXISTS`, no driver-side key list). */
  def deleteMatching(table: String, staging: String, keys: Seq[String],
      stringCols: Set[String]): String = {
    val keyMatch = keys.map(k =>
      s"${keyRef("s", k, stringCols(k))} = ${keyRef("t", k, stringCols(k))}")
      .mkString(" AND ")
    s"DELETE FROM $table t WHERE EXISTS " +
      s"(SELECT 1 FROM $staging s WHERE $keyMatch)"
  }

  /** Full-reload member 1: the reference's unscoped `DELETE FROM table`
    * (`kpi_receita_farmer_m_passado/load.py:51`). */
  def deleteAll(table: String): String = s"DELETE FROM $table"

  /** One-transaction member 2: move the staged batch into the target. */
  def insertFromStaging(table: String, staging: String,
      cols: Seq[String]): String = {
    val colList = cols.map(quote).mkString(", ")
    s"INSERT INTO $table ($colList) SELECT $colList FROM $staging"
  }

  /** Native single-statement upsert from staging, where the dialect has
    * one (Postgres `INSERT ... ON CONFLICT DO UPDATE`).  `None` means the
    * dialect must express MERGE as delete-matching + insert — which is
    * what [[Sinks.overwriteByKeyJdbc]] does anyway, so the delete+insert
    * path is the portable default and this is the Postgres fast path
    * (one statement, no delete bloat under MVCC). */
  def upsertFromStaging(table: String, staging: String, keys: Seq[String],
      cols: Seq[String]): Option[String] = None

  /** Unique index over the upsert keys, issued when [[Sinks.mergeJdbc]]
    * BOOTSTRAPS a missing target: Spark's JDBC writer emits a bare
    * `CREATE TABLE` with no constraints, and Postgres `ON CONFLICT (keys)`
    * requires a matching unique index or it fails at runtime with "no
    * unique or exclusion constraint matching the ON CONFLICT
    * specification" (r8 ADVICE #1).  Also enforces the one-row-per-key
    * contract database-side on every dialect.  The name is derived from
    * the table's last component and truncated to 63 bytes (Postgres's
    * identifier limit; Derby allows 128). */
  def createUniqueIndex(table: String, keys: Seq[String]): String = {
    val base = table.split('.').last
    val idx = ("ux_" + (base +: keys).map(_.replaceAll("[^A-Za-z0-9_]", "_"))
      .mkString("_")).take(63)
    s"CREATE UNIQUE INDEX ${quote(idx)} ON $table " +
      s"(${keys.map(quote).mkString(", ")})"
  }

  def dropTable(table: String): String = s"DROP TABLE $table"
}

object SqlDialect {

  /** Embedded Derby — the dialect the sandbox can actually execute.
    * Spark's Derby dialect maps `StringType` to CLOB and `CLOB = CLOB`
    * is not a supported comparison, so string keys compare through a
    * VARCHAR cast (the quirk that motivated this abstraction). */
  case object Derby extends SqlDialect {
    val name = "derby"
    override def keyRef(alias: String, column: String,
        isString: Boolean): String =
      if (isString) s"CAST($alias.${quote(column)} AS VARCHAR(32672))"
      else super.keyRef(alias, column, isString)
  }

  /** Postgres — the reference's actual target
    * (`utils/db_connection.py:44-51`).  Spark maps `StringType` to TEXT,
    * which compares directly; `ON CONFLICT` gives a native one-statement
    * upsert. */
  case object Postgres extends SqlDialect {
    val name = "postgresql"
    override def upsertFromStaging(table: String, staging: String,
        keys: Seq[String], cols: Seq[String]): Option[String] = {
      val colList = cols.map(quote).mkString(", ")
      val keyList = keys.map(quote).mkString(", ")
      val updates = cols.filterNot(keys.contains)
        .map(c => s"${quote(c)} = EXCLUDED.${quote(c)}").mkString(", ")
      // All-key tables degrade to DO NOTHING (nothing non-key to update).
      val action =
        if (updates.isEmpty) "DO NOTHING" else s"DO UPDATE SET $updates"
      Some(s"INSERT INTO $table ($colList) SELECT $colList FROM $staging " +
        s"ON CONFLICT ($keyList) $action")
    }
  }

  /** Resolve from the JDBC URL — the same dispatch Spark's own
    * `JdbcDialects.get` performs.  Unknown engines FAIL FAST rather than
    * defaulting: the previous Derby fallback emitted
    * `CAST(x AS VARCHAR(32672))` string-key comparisons, which is not
    * portable SQL (MySQL needs `CAST AS CHAR`, other engines cap VARCHAR
    * length), so a silent default would point raw transactional DDL/DML
    * at an engine whose quirks were never proven (r8 ADVICE #5).  Adding
    * an engine means adding a dialect object with pinned statement text,
    * not hoping the Derby text happens to parse. */
  def forUrl(url: String): SqlDialect =
    if (url.startsWith("jdbc:postgresql")) Postgres
    else if (url.startsWith("jdbc:derby")) Derby
    else throw new IllegalArgumentException(
      s"No SqlDialect for JDBC URL '$url' (supported: jdbc:postgresql, " +
        "jdbc:derby). The transactional load path emits raw SQL whose " +
        "quoting/string-comparison/upsert corners are engine-specific; " +
        "add a pinned dialect instead of guessing.")
}

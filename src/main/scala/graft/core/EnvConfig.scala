package graft.core

/** Environment-driven connection config — the reference's S2 surface.
  *
  * The reference builds its Postgres connection exclusively from `.env`
  * (`utils/db_connection.py:18-58`): `DB_HOST/DB_PORT/DB_NAME/DB_USER/
  * DB_PASSWORD`, all mandatory with a missing-keys error, plus
  * `DB_OPTIONS` defaulting to `-c search_path=gammadata`.  This maps the
  * same variables onto Spark's JDBC options: the libpq `search_path`
  * option becomes the pgJDBC `currentSchema` URL parameter, and the
  * missing-keys check fails with the same "name every absent variable"
  * shape rather than a bare NPE at connect time.
  *
  * `DB_URL` short-circuits the whole derivation (used by tests to point
  * the identical code path at embedded Derby, and by any deployment that
  * already holds a full JDBC URL).
  */
final case class JdbcEnv(
    url: String,
    user: Option[String],
    password: Option[String],
    /** Force a [[SqlDialect]] instead of deriving it from the URL — the
      * execute-one-dialect's-text-on-another-engine hook: PgExecSpec
      * points the UNCHANGED Postgres statement text at DuckDB (the only
      * engine in this zero-egress sandbox that parses it), so the
      * production Postgres load path runs for real instead of being
      * text-pinned only.  Production deployments leave it None. */
    dialectOverride: Option[SqlDialect] = None) {

  /** The dialect every raw statement on this connection speaks. */
  def dialect: SqlDialect =
    dialectOverride.getOrElse(SqlDialect.forUrl(url))

  /** Options for `spark.read/write.format("jdbc")` — credentials ride as
    * options, never embedded in the URL (they would leak into plans and
    * logs). */
  def options: Map[String, String] =
    Map("url" -> url) ++
      user.map("user" -> _) ++ password.map("password" -> _)
}

object JdbcEnv {

  private val Required = Seq("DB_HOST", "DB_PORT", "DB_NAME", "DB_USER",
    "DB_PASSWORD")

  /** Parse `search_path=X` out of a libpq options string like
    * `-c search_path=gammadata` (the reference's DB_OPTIONS default). */
  private[core] def searchPath(dbOptions: String): Option[String] =
    "search_path=([^\\s,]+)".r.findFirstMatchIn(dbOptions).map(_.group(1))

  def fromEnv(env: Map[String, String]): JdbcEnv =
    env.get("DB_URL") match {
      case Some(url) =>
        JdbcEnv(url, env.get("DB_USER"), env.get("DB_PASSWORD"))
      case None =>
        val missing = Required.filter(k => env.get(k).forall(_.isEmpty))
        require(missing.isEmpty,
          s"Missing required connection variables: ${missing.mkString(", ")}")
        val schema = searchPath(
          env.getOrElse("DB_OPTIONS", "-c search_path=gammadata"))
        val url = s"jdbc:postgresql://${env("DB_HOST")}:${env("DB_PORT")}/" +
          env("DB_NAME") + schema.map(s => s"?currentSchema=$s").getOrElse("")
        JdbcEnv(url, Some(env("DB_USER")), Some(env("DB_PASSWORD")))
    }

  def fromEnv(): JdbcEnv = fromEnv(sys.env)
}

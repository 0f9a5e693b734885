package graft.core

/** Identifier hygiene — the reference's only "schema validation" layer:
  * `validate_table_name` (`src/jsonb/mod.rs:35-87`),
  * `validate_postgres_identifier` (`src/utils.rs:392-438`), and the
  * quoting helpers (`src/utils.rs:481-543`). All SQL this engine
  * generates (JDBC catalog queries, upsert/delete statements) goes
  * through these before any string interpolation — the security corpus
  * in the reference (`tests/security_test.rs`) is the spec.
  */
object Identifiers {

  /** PostgreSQL reserved words the reference denies as table names. */
  private val reserved = Set(
    "select", "insert", "update", "delete", "drop", "create", "alter",
    "table", "index", "view", "from", "where", "join", "union", "group",
    "order", "having", "limit", "offset", "grant", "revoke", "user",
    "database", "schema", "truncate", "cascade", "primary", "foreign",
    "references", "constraint", "default", "null", "not", "and", "or")

  private val identRe = "^[a-zA-Z_][a-zA-Z0-9_]*$".r

  /** Reference `src/jsonb/mod.rs:35-87`: alnum+underscore, no leading
    * digit, ≤63 chars (PG NAMEDATALEN-1), not a reserved word. */
  def validateTableName(name: String): Either[String, String] =
    if (name.isEmpty) Left("table name is empty")
    else if (name.length > 63) Left(s"table name too long (${name.length} > 63)")
    else if (identRe.findFirstIn(name).isEmpty)
      Left(s"invalid table name: '$name'")
    else if (reserved.contains(name.toLowerCase))
      Left(s"table name is a reserved word: '$name'")
    else Right(name)

  /** Reference `src/utils.rs:392-438` — same shape, for any identifier. */
  def validateIdentifier(name: String): Either[String, String] =
    if (name.isEmpty) Left("identifier is empty")
    else if (name.length > 63) Left(s"identifier too long (${name.length} > 63)")
    else if (identRe.findFirstIn(name).isEmpty) Left(s"invalid identifier: '$name'")
    else Right(name)

  /** Double-quote an identifier, doubling embedded quotes
    * (reference `quote_ident` `src/utils.rs:481-500`). */
  def quoteIdent(name: String): String =
    "\"" + name.replace("\"", "\"\"") + "\""

  /** Single-quote a literal, doubling embedded quotes
    * (reference `quote_literal` `src/utils.rs:502-520`). */
  def quoteLiteral(value: String): String =
    "'" + value.replace("'", "''") + "'"

  /** Backtick-quote for MySQL (reference `quote_mysql_ident`
    * `src/utils.rs:522-543`). */
  def quoteMysqlIdent(name: String): String =
    "`" + name.replace("`", "``") + "`"

  /** Reject path traversal in SQLite file paths
    * (reference `tests/security_test.rs:38-134`). */
  def validateSqlitePath(path: String): Either[String, String] =
    if (path.contains(".."))
      Left(s"path traversal rejected: '$path'")
    else if (!(path.endsWith(".db") || path.endsWith(".sqlite") || path.endsWith(".sqlite3")))
      Left(s"not a SQLite file: '$path'")
    else Right(path)
}

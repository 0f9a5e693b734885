package graft.sources

import java.sql.Connection

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.types.StructType

import graft.core.Identifiers.quoteLiteral
import graft.types.PgTypeMap

/** Catalog introspection — the reference's discovery layer, re-expressed
  * as plain JDBC metadata queries executed driver-side (catalog results
  * are metadata, not data: a few thousand rows at most, never worth a
  * distributed scan).
  *
  * SQL mirrors the reference byte-for-byte where it matters:
  *   - database list (non-template, minus `postgres`/`rdsadmin`) —
  *     `src/migration/schema.rs:33-55`
  *   - table list with row estimates (`pg_tables ⋈ pg_stat_user_tables`)
  *     — `src/migration/schema.rs:58-86`
  *   - column list (name, udt_name → Spark type) —
  *     `src/migration/schema.rs:92-130`, `src/xmin/writer.rs:384-408`
  *   - ordered PK columns from `pg_index`/`pg_attribute` —
  *     `src/xmin/writer.rs:413-435`
  *   - SQLite `sqlite_master` (excl. `sqlite_%`) — `src/sqlite/reader.rs:36-57`
  *   - MySQL `INFORMATION_SCHEMA` — `src/mysql/reader.rs:32-51`,
  *     `src/mysql/converter.rs:173-200`
  */
object JdbcCatalog {

  final case class DatabaseInfo(name: String, owner: String)
  final case class TableInfo(schema: String, name: String, rowCountEstimate: Long)
  final case class ColumnInfo(name: String, dataType: String, isTimestamp: Boolean)

  // ---- SQL text (exposed for tests and for callers that push down) ----

  val listDatabasesSql: String =
    """SELECT d.datname, pg_catalog.pg_get_userbyid(d.datdba) AS owner
      |FROM pg_catalog.pg_database d
      |WHERE d.datistemplate = false
      |  AND d.datname NOT IN ('postgres', 'rdsadmin')
      |ORDER BY d.datname""".stripMargin

  val listTablesSql: String =
    """SELECT t.schemaname, t.tablename,
      |       COALESCE(s.n_live_tup, 0) AS row_estimate
      |FROM pg_catalog.pg_tables t
      |LEFT JOIN pg_catalog.pg_stat_user_tables s
      |  ON t.schemaname = s.schemaname AND t.tablename = s.relname
      |WHERE t.schemaname NOT IN ('pg_catalog', 'information_schema')
      |ORDER BY t.schemaname, t.tablename""".stripMargin

  def tableColumnsSql(schema: String, table: String): String =
    s"""SELECT column_name, udt_name,
       |       CASE WHEN data_type LIKE 'timestamp%' THEN true ELSE false END AS is_timestamp
       |FROM information_schema.columns
       |WHERE table_schema = ${quoteLiteral(schema)}
       |  AND table_name = ${quoteLiteral(table)}
       |ORDER BY ordinal_position""".stripMargin

  def primaryKeyColumnsSql(schema: String, table: String): String =
    s"""SELECT a.attname
       |FROM pg_index i
       |JOIN pg_attribute a ON a.attrelid = i.indrelid AND a.attnum = ANY(i.indkey)
       |WHERE i.indrelid = ${quoteLiteral(schema + "." + table)}::regclass
       |  AND i.indisprimary
       |ORDER BY array_position(i.indkey, a.attnum)""".stripMargin

  val sqliteListTablesSql: String =
    """SELECT name FROM sqlite_master
      |WHERE type = 'table' AND name NOT LIKE 'sqlite_%'
      |ORDER BY name""".stripMargin

  def mysqlListTablesSql(database: String): String =
    s"""SELECT TABLE_NAME FROM INFORMATION_SCHEMA.TABLES
       |WHERE TABLE_SCHEMA = ${quoteLiteral(database)} AND TABLE_TYPE = 'BASE TABLE'
       |ORDER BY TABLE_NAME""".stripMargin

  def mysqlColumnsSql(database: String, table: String): String =
    s"""SELECT COLUMN_NAME FROM INFORMATION_SCHEMA.COLUMNS
       |WHERE TABLE_SCHEMA = ${quoteLiteral(database)}
       |  AND TABLE_NAME = ${quoteLiteral(table)}
       |ORDER BY ORDINAL_POSITION""".stripMargin

  def rowCountSql(schema: String, table: String): String =
    s"SELECT COUNT(*) FROM ${graft.core.Identifiers.quoteIdent(schema)}.${graft.core.Identifiers.quoteIdent(table)}"

  // ---- executors ------------------------------------------------------

  private def query[T](conn: Connection, sql: String)(read: java.sql.ResultSet => T): List[T] = {
    val st = conn.createStatement()
    try {
      val rs = st.executeQuery(sql)
      val out = ListBuffer.empty[T]
      while (rs.next()) out += read(rs)
      out.toList
    } finally st.close()
  }

  def listDatabases(conn: Connection): List[DatabaseInfo] =
    query(conn, listDatabasesSql)(rs => DatabaseInfo(rs.getString(1), rs.getString(2)))

  def listTables(conn: Connection): List[TableInfo] =
    query(conn, listTablesSql)(rs => TableInfo(rs.getString(1), rs.getString(2), rs.getLong(3)))

  def tableColumns(conn: Connection, schema: String, table: String): List[ColumnInfo] =
    query(conn, tableColumnsSql(schema, table))(rs =>
      ColumnInfo(rs.getString(1), rs.getString(2), rs.getBoolean(3)))

  def primaryKeyColumns(conn: Connection, schema: String, table: String): List[String] =
    query(conn, primaryKeyColumnsSql(schema, table))(_.getString(1))

  def rowCount(conn: Connection, schema: String, table: String): Long = {
    val st = conn.createStatement()
    try {
      val rs = st.executeQuery(rowCountSql(schema, table))
      rs.next(); rs.getLong(1)
    } finally st.close()
  }

  /** Spark schema for a table, via the udt_name map — the reference's
    * in-memory `(column, udt_name)` schema shape made typed. */
  def structTypeFor(conn: Connection, schema: String, table: String): StructType =
    PgTypeMap.structType(tableColumns(conn, schema, table).map(c => (c.name, c.dataType)))
}

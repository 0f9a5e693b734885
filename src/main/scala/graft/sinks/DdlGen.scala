package graft.sinks

import org.apache.spark.sql.types._

import graft.core.Identifiers.{quoteIdent, quoteLiteral}

/** DDL generation — the executable replacement for the reference's
  * `pg_dump --schema-only` transport (S7, `src/migration/dump.rs:443-554`)
  * plus the maintenance statements: truncate (K8,
  * `src/jsonb/writer.rs:126-165`), drop (K9, `writer.rs:325-341`), and
  * database create/drop (K13, `src/commands/init.rs:432-563, 888-964`).
  * Statements execute through [[JdbcUpsertWriter.executeDdl]].
  */
object DdlGen {

  /** Spark type → PostgreSQL column type (the inverse of PgTypeMap). */
  def pgType(dt: DataType): String = dt match {
    case ByteType | ShortType  => "smallint"
    case IntegerType           => "integer"
    case LongType              => "bigint"
    case FloatType             => "real"
    case DoubleType            => "double precision"
    case BooleanType           => "boolean"
    case StringType            => "text"
    case BinaryType            => "bytea"
    case d: DecimalType        => s"numeric(${d.precision},${d.scale})"
    case TimestampType         => "timestamptz"
    case TimestampNTZType      => "timestamp"
    case DateType              => "date"
    case ArrayType(et, _)      => pgType(et) + "[]"
    case _: StructType | _: MapType => "jsonb" // nested data rides as documents
    case _                     => "text"
  }

  /** `CREATE TABLE IF NOT EXISTS` from a Spark schema, with optional PK.
    * NOT NULL follows the schema's nullability (PK columns are implicitly
    * NOT NULL in PG). */
  def createTableDdl(table: String, schema: StructType,
                     pkCols: Seq[String] = Nil): String = {
    val cols = schema.fields.map { f =>
      val notNull = if (!f.nullable && !pkCols.contains(f.name)) " NOT NULL" else ""
      s"  ${quoteIdent(f.name)} ${pgType(f.dataType)}$notNull"
    }
    val pk =
      if (pkCols.isEmpty) ""
      else s",\n  PRIMARY KEY (${pkCols.map(quoteIdent).mkString(", ")})"
    s"CREATE TABLE IF NOT EXISTS ${quoteIdent(table)} (\n${cols.mkString(",\n")}$pk\n)"
  }

  /** K8 — idempotent re-init (`writer.rs:126-165`). */
  def truncateSql(table: String): String =
    s"TRUNCATE TABLE ${quoteIdent(table)} RESTART IDENTITY CASCADE"

  /** K9 (`writer.rs:325-341`). */
  def dropTableSql(table: String): String =
    s"DROP TABLE IF EXISTS ${quoteIdent(table)} CASCADE"

  /** K13 create — the caller catches duplicate_database (42P04) to make
    * it atomic-idempotent like `init.rs:432-563`. */
  def createDatabaseSql(name: String, owner: Option[String] = None): String =
    s"CREATE DATABASE ${quoteIdent(name)}" +
      owner.map(o => s" OWNER ${quoteIdent(o)}").getOrElse("")

  /** K13 drop, preceded by backend termination (`init.rs:888-964`). */
  def terminateBackendsSql(name: String): String =
    s"""SELECT pg_terminate_backend(pid) FROM pg_stat_activity
       |WHERE datname = ${quoteLiteral(name)} AND pid <> pg_backend_pid()""".stripMargin

  def dropDatabaseSql(name: String): String =
    s"DROP DATABASE IF EXISTS ${quoteIdent(name)}"
}

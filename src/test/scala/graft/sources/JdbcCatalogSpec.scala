package graft.sources

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.MockJdbc

class JdbcCatalogSpec extends AnyFunSuite {

  test("listDatabases excludes templates and service DBs in the SQL and parses rows") {
    assert(JdbcCatalog.listDatabasesSql.contains("datistemplate = false"))
    assert(JdbcCatalog.listDatabasesSql.contains("'postgres', 'rdsadmin'"))
    val key = "cat-dbs"; MockJdbc.reset(key)
    MockJdbc.setQueryHandler(key, _ => Seq(Seq("app", "owner1"), Seq("crm", "owner2")))
    val dbs = JdbcCatalog.listDatabases(MockJdbc.connection(key))
    assert(dbs == List(
      JdbcCatalog.DatabaseInfo("app", "owner1"),
      JdbcCatalog.DatabaseInfo("crm", "owner2")))
  }

  test("listTables joins live-tuple estimates (schema.rs:58-86)") {
    assert(JdbcCatalog.listTablesSql.contains("pg_stat_user_tables"))
    val key = "cat-tables"; MockJdbc.reset(key)
    MockJdbc.setQueryHandler(key, _ => Seq(Seq("public", "orders", 1234L)))
    val ts = JdbcCatalog.listTables(MockJdbc.connection(key))
    assert(ts == List(JdbcCatalog.TableInfo("public", "orders", 1234L)))
  }

  test("tableColumns quotes literals (injection-safe) and orders by position") {
    val sql = JdbcCatalog.tableColumnsSql("public", "o'; DROP TABLE x--")
    assert(sql.contains("'o''; DROP TABLE x--'")) // doubled quote, no breakout
    assert(sql.contains("ORDER BY ordinal_position"))
  }

  test("primaryKeyColumns preserves index column order (writer.rs:413-435)") {
    val key = "cat-pks"; MockJdbc.reset(key)
    MockJdbc.setQueryHandler(key, _ => Seq(Seq("tenant_id"), Seq("id")))
    val pks = JdbcCatalog.primaryKeyColumns(MockJdbc.connection(key), "public", "t")
    assert(pks == List("tenant_id", "id"))
    assert(JdbcCatalog.primaryKeyColumnsSql("public", "t").contains("indisprimary"))
  }

  test("structTypeFor maps udt names through PgTypeMap") {
    val key = "cat-struct"; MockJdbc.reset(key)
    MockJdbc.setQueryHandler(key, _ => Seq(
      Seq("id", "int8", false), Seq("name", "text", false),
      Seq("created", "timestamptz", true), Seq("tags", "_text", false)))
    val st = JdbcCatalog.structTypeFor(MockJdbc.connection(key), "public", "t")
    assert(st == StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("created", TimestampType),
      StructField("tags", ArrayType(StringType)))))
  }

  test("sqlite and mysql catalog SQL exclude system objects") {
    assert(JdbcCatalog.sqliteListTablesSql.contains("NOT LIKE 'sqlite_%'"))
    assert(JdbcCatalog.mysqlListTablesSql("db").contains("TABLE_TYPE = 'BASE TABLE'"))
    assert(JdbcCatalog.mysqlColumnsSql("db", "t").contains("ORDER BY ORDINAL_POSITION"))
  }

  test("rowCount executes COUNT(*) against the quoted table") {
    val key = "cat-count"; MockJdbc.reset(key)
    MockJdbc.setQueryHandler(key, _ => Seq(Seq(42L)))
    assert(JdbcCatalog.rowCount(MockJdbc.connection(key), "public", "t") == 42L)
    assert(JdbcCatalog.rowCountSql("public", "t") == """SELECT COUNT(*) FROM "public"."t"""")
  }
}

package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Filter / rule / identifier semantics — mirrors the reference's
  * inline-unit layer (`src/filters.rs:314-580`) and security corpus
  * (`tests/security_test.rs:136-258`). */
class FiltersSpec extends AnyFunSuite {

  // ---- ReplicationFilter ---------------------------------------------

  test("empty filter replicates everything") {
    val f = ReplicationFilter()
    assert(f.shouldReplicateDatabase("any"))
    assert(f.shouldReplicateTable("any", "t"))
  }

  test("explicit excludes always win (filters.rs:184-230)") {
    val f = ReplicationFilter(excludeDatabases = Set("skip"))
    assert(!f.shouldReplicateDatabase("skip") && f.shouldReplicateDatabase("keep"))
    val t = ReplicationFilter(excludeTables = Set("db.secret"))
    assert(!t.shouldReplicateTable("db", "secret") && t.shouldReplicateTable("db", "open"))
  }

  test("table includes imply their database (filters.rs:155-174)") {
    val f = ReplicationFilter(includeTables = Set("sales.orders"))
    assert(f.databasesToCheck == Set("sales"))
    assert(f.shouldReplicateDatabase("sales") && !f.shouldReplicateDatabase("hr"))
    assert(f.shouldReplicateTable("sales", "orders") && !f.shouldReplicateTable("sales", "other"))
  }

  test("include XOR exclude enforced") {
    intercept[IllegalArgumentException] {
      ReplicationFilter(includeDatabases = Set("a"), excludeDatabases = Set("b"))
    }
  }

  test("fingerprint is order-insensitive and config-sensitive") {
    val a = ReplicationFilter(includeTables = Set("d.a", "d.b"))
    val b = ReplicationFilter(includeTables = Set("d.b", "d.a"))
    assert(a.fingerprint == b.fingerprint)
    assert(a.fingerprint != ReplicationFilter(includeTables = Set("d.a")).fingerprint)
    assert(a.fingerprint.matches("[0-9a-f]{64}"))
  }

  test("fingerprint distinguishes empty list from <none> semantics") {
    // include-tables {} vs include-databases {} land in different sections
    val inc = ReplicationFilter(includeDatabases = Set("x"))
    val tbl = ReplicationFilter(includeTables = Set("x"))
    assert(inc.fingerprint != tbl.fingerprint)
  }

  // ---- TableRules -----------------------------------------------------

  test("SQL filter and time filter are mutually exclusive per table") {
    val r = TableRules()
    val withSql = r.addTableFilter("d.t", "x > 1").toOption.get
    assert(withSql.addTimeFilter("d.t", "ts", "7 days").isLeft)
    val withTime = r.addTimeFilter("d.t", "ts", "7 days").toOption.get
    assert(withTime.addTableFilter("d.t", "x > 1").isLeft)
  }

  test("normalizeTimeWindow validates and pluralizes (table_rules.rs:479)") {
    val r = TableRules()
    assert(r.normalizeTimeWindow("7 day") == Right("7 days"))
    assert(r.normalizeTimeWindow("  1 WEEK ") == Right("1 weeks"))
    assert(r.normalizeTimeWindow("3 fortnights").isLeft)
    assert(r.normalizeTimeWindow("day").isLeft)
  }

  test("predicateTables merges SQL and rendered time predicates") {
    val r = TableRules()
      .addTableFilter("d.a", "x > 1").toOption.get
      .addTimeFilter("d.b", "ts", "2 days").toOption.get
    assert(r.predicateTables == Map(
      "d.a" -> "x > 1",
      "d.b" -> "\"ts\" >= NOW() - INTERVAL '2 days'"))
  }

  test("QualifiedTable parses 1/2/3-part names with public default") {
    assert(QualifiedTable.parse("t") == Right(QualifiedTable(None, "public", "t")))
    assert(QualifiedTable.parse("s.t") == Right(QualifiedTable(None, "s", "t")))
    assert(QualifiedTable.parse("d.s.t") == Right(QualifiedTable(Some("d"), "s", "t")))
    assert(QualifiedTable.parse("a.b.c.d").isLeft)
  }

  test("rules fingerprint changes with any rule change") {
    val base = TableRules(schemaOnly = Set("d.t"))
    assert(base.fingerprint != TableRules().fingerprint)
    assert(base.fingerprint !=
      TableRules(tableFilters = Map("d.t" -> "1=1")).fingerprint)
  }

  // ---- Identifiers (security corpus) ----------------------------------

  test("validateTableName rejects injection attempts (security_test.rs:136-258)") {
    for (bad <- Seq("users; DROP TABLE x", "a\"b", "1leading", "", "a" * 64,
        "Robert'); DROP", "a b", "a-b", "select"))
      assert(Identifiers.validateTableName(bad).isLeft, s"should reject: $bad")
    assert(Identifiers.validateTableName("valid_name_42").isRight)
  }

  test("quoting doubles embedded quote characters") {
    assert(Identifiers.quoteIdent("""we"ird""") == """"we""ird"""")
    assert(Identifiers.quoteLiteral("o'brien") == "'o''brien'")
    assert(Identifiers.quoteMysqlIdent("a`b") == "`a``b`")
  }

  test("sqlite path validation rejects traversal (security_test.rs:38-134)") {
    assert(Identifiers.validateSqlitePath("../../etc/passwd.db").isLeft)
    assert(Identifiers.validateSqlitePath("/data/app.exe").isLeft)
    assert(Identifiers.validateSqlitePath("/data/app.sqlite3").isRight)
  }

  // ---- SourceType / PgTypeMap ----------------------------------------

  test("source detection by scheme then file extension (lib.rs:65-86)") {
    assert(SourceType.detect("postgresql://h/db") == Right(SourceType.PostgreSQL))
    assert(SourceType.detect("postgres://h/db") == Right(SourceType.PostgreSQL))
    assert(SourceType.detect("mongodb+srv://c") == Right(SourceType.MongoDB))
    assert(SourceType.detect("mariadb://h") == Right(SourceType.MySQL))
    assert(SourceType.detect("data/app.sqlite3") == Right(SourceType.SQLite))
    assert(SourceType.detect("ftp://nope").isLeft)
  }

  test("pg type map covers arrays and falls back to text") {
    import org.apache.spark.sql.types._
    import graft.types.PgTypeMap
    assert(PgTypeMap.sparkType("int8") == LongType)
    assert(PgTypeMap.sparkType("_int4") == ArrayType(IntegerType))
    assert(PgTypeMap.sparkType("timestamptz") == TimestampType)
    assert(PgTypeMap.sparkType("some_custom_enum") == StringType)
    assert(PgTypeMap.sparkType("numeric") == DecimalType(38, 18))
  }
}

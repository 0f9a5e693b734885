package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{ReplicationFilter, TableRules}
import graft.snapshot.GlobalsSanitizer

/** Logical-replication DDL, globals sanitization (mirrors the reference's
  * dump-sanitizer tests `src/migration/dump.rs:778-995`), WAL watching. */
class ReplicationSpec extends AnyFunSuite {

  // ---- LogicalReplication --------------------------------------------

  test("empty filter publishes FOR ALL TABLES (publication.rs:42-47)") {
    val sql = LogicalReplication.createPublicationSql("db", "pub",
      ReplicationFilter(), TableRules(), Seq(("public", "t1")), 140000)
    assert(sql == Right("""CREATE PUBLICATION "pub" FOR ALL TABLES"""))
  }

  test("filtered publication lists tables, drops schema-only, attaches predicates") {
    val filter = ReplicationFilter(excludeTables = Set("db.skipme"))
    val rules = TableRules(
      schemaOnly = Set("db.public.ddl_only"),
      tableFilters = Map("db.public.orders" -> "o_total > 100"))
    val sql = LogicalReplication.createPublicationSql("db", "pub", filter, rules,
      Seq(("public", "orders"), ("public", "ddl_only"), ("public", "skipme"),
        ("public", "plain")),
      serverVersion = 150001)
    assert(sql == Right(
      """CREATE PUBLICATION "pub" FOR TABLE """ +
        """"public"."orders" WHERE (o_total > 100), "public"."plain""""))
  }

  test("predicates below PG15 are rejected (publication.rs:108-117)") {
    val rules = TableRules(tableFilters = Map("db.public.t" -> "x > 1"))
    val sql = LogicalReplication.createPublicationSql("db", "pub",
      ReplicationFilter(includeTables = Set("db.t")), rules,
      Seq(("public", "t")), serverVersion = 140008)
    assert(sql.isLeft && sql.swap.toOption.get.contains("PostgreSQL 15+"))
  }

  test("all tables filtered away is an error, and bad names are rejected") {
    val sql = LogicalReplication.createPublicationSql("db", "pub",
      ReplicationFilter(includeTables = Set("db.only_this")), TableRules(),
      Seq(("public", "other")), 150000)
    assert(sql.isLeft)
    assert(LogicalReplication.createPublicationSql("db", "bad name;",
      ReplicationFilter(), TableRules(), Nil, 150000).isLeft)
  }

  test("subscription DDL quotes the connection string as a literal") {
    val sql = LogicalReplication.createSubscriptionSql("sub",
      "postgresql://u:p'x@h/db", "pub")
    assert(sql == Right(
      """CREATE SUBSCRIPTION "sub" CONNECTION 'postgresql://u:p''x@h/db' PUBLICATION "pub""""))
  }

  test("srsubstate codes map to the reference's states") {
    import LogicalReplication.SubState._
    assert(LogicalReplication.interpretSubState("i") == Initializing)
    assert(LogicalReplication.interpretSubState("d") == CopyingData)
    assert(LogicalReplication.interpretSubState("s") == Synchronized)
    assert(LogicalReplication.interpretSubState("r") == Ready)
    assert(LogicalReplication.interpretSubState("x") == Unknown("x"))
  }

  test("caught-up = every slot under 1000ms replay lag (monitor.rs:153-177)") {
    import LogicalReplication.SlotLag
    assert(!LogicalReplication.isCaughtUp(Nil)) // no active replication
    assert(LogicalReplication.isCaughtUp(Seq(
      SlotLag("a", "streaming", Some(200.0)), SlotLag("b", "streaming", Some(999.0)))))
    assert(!LogicalReplication.isCaughtUp(Seq(SlotLag("a", "streaming", Some(1500.0)))))
    assert(!LogicalReplication.isCaughtUp(Seq(SlotLag("a", "catchup", None))))
  }

  // ---- GlobalsSanitizer ----------------------------------------------

  test("superuser and GUC alterations are commented out, not deleted") {
    val dump =
      """CREATE ROLE app;
        |ALTER ROLE admin WITH SUPERUSER;
        |ALTER ROLE app SET log_statement = 'all';
        |ALTER ROLE app WITH LOGIN;
        |""".stripMargin
    val out = GlobalsSanitizer.removeRestrictedGucSettings(
      GlobalsSanitizer.removeSuperuser(dump))
    assert(out.contains("-- ALTER ROLE admin WITH SUPERUSER;"))
    assert(out.contains("-- ALTER ROLE app SET log_statement = 'all';"))
    assert(out.contains("\nALTER ROLE app WITH LOGIN;")) // untouched
  }

  test("tablespace and rds_* references are stripped (dump.rs:181-221)") {
    val dump =
      """CREATE TABLESPACE ts1 LOCATION '/data';
        |SECURITY LABEL ON TABLESPACE rds_temp_tablespace IS 'x';
        |GRANT CREATE ON TABLESPACE "rds_custom" TO app;
        |CREATE ROLE keeper;
        |""".stripMargin
    val out = GlobalsSanitizer.removeTablespaceStatements(dump)
    assert(out.linesIterator.count(_.startsWith("-- ")) == 3)
    assert(out.contains("\nCREATE ROLE keeper;"))
  }

  test("restricted role grants and RDS grantors are stripped (dump.rs:228-301)") {
    val dump =
      """GRANT pg_checkpoint TO app;
        |GRANT "pg_monitor" TO app;
        |GRANT reporting TO app GRANTED BY rdsadmin;
        |GRANT reporting TO app;
        |""".stripMargin
    val out = GlobalsSanitizer.removeRestrictedRoleGrants(dump)
    assert(out.linesIterator.count(_.startsWith("-- ")) == 3)
    assert(out.contains("\nGRANT reporting TO app;"))
  }

  test("CREATE ROLE becomes an idempotent DO block (dump.rs:303-440)") {
    val out = GlobalsSanitizer.wrapCreateRoles("CREATE ROLE \"we\"\"ird\" WITH LOGIN;\n")
    assert(out.contains("DO $$"))
    assert(out.contains("    CREATE ROLE \"we\"\"ird\" WITH LOGIN;"))
    assert(out.contains("WHEN duplicate_object THEN"))
    // notice text unquotes the identifier and escapes single quotes
    assert(out.contains("'Role we\"ird already exists on target, skipping CREATE ROLE'"))
    assert(out.contains("END $$;"))
  }

  test("sanitizeAll composes every pass") {
    val dump =
      """CREATE ROLE app;
        |ALTER ROLE admin WITH SUPERUSER;
        |GRANT pg_checkpoint TO app;
        |SELECT 1;
        |""".stripMargin
    val out = GlobalsSanitizer.sanitizeAll(dump)
    assert(out.contains("DO $$") && out.contains("-- ALTER ROLE admin") &&
      out.contains("-- GRANT pg_checkpoint") && out.contains("\nSELECT 1;"))
  }

  // ---- WalWatcher -----------------------------------------------------

  test("wal growth emits events; truncation resets the baseline silently") {
    val wal = Files.createTempDirectory("wal").resolve("db-wal")
    import WalWatcher._
    val s0 = State(0)
    Files.write(wal, new Array[Byte](100))
    val (s1, e1) = step(wal, s0)
    assert(e1.contains(WalEvent(100, 100)) && s1.lastSize == 100)
    val (s2, e2) = step(wal, s1)
    assert(e2.isEmpty && s2 == s1) // no change
    Files.write(wal, new Array[Byte](40)) // checkpoint truncation
    val (s3, e3) = step(wal, s2)
    assert(e3.isEmpty && s3.lastSize == 40)
    Files.write(wal, new Array[Byte](65))
    val (s4, e4) = step(wal, s3)
    assert(e4.contains(WalEvent(25, 65)) && s4.lastSize == 65)
  }
}

package graft.sinks

import java.sql.{Connection, DriverManager}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.JdbcCatalog

/** Env-gated LIVE database integration — the reference's pattern
  * (`tests/integration_test.rs`, `#[ignore]` + `TEST_TARGET_URL`): the
  * JDBC executors are mock-pinned by default (the sandbox has no live
  * databases), but when a real PostgreSQL is available these tests drive
  * the exact same code paths end-to-end.
  *
  * Run with e.g.
  * {{{
  *   TEST_TARGET_URL='jdbc:postgresql://localhost/test?user=u&password=p' sbt test
  * }}}
  * (the PG JDBC driver jar must be on the runtime classpath). Without the
  * env var every test cancels — visible in the report, never red.
  */
class LiveJdbcIntegrationSpec extends AnyFunSuite {

  private val url = sys.env.get("TEST_TARGET_URL")

  private def withConn(f: Connection => Unit): Unit = url match {
    case None =>
      cancel("TEST_TARGET_URL not set — live-DB integration skipped " +
        "(mock-pinned suites cover these paths; reference: tests/integration_test.rs)")
    case Some(u) =>
      val conn =
        try DriverManager.getConnection(u)
        catch { case e: java.sql.SQLException =>
          cancel(s"TEST_TARGET_URL set but connection failed: ${e.getMessage}")
        }
      try f(conn) finally conn.close()
  }

  test("catalog introspection runs against a live PG (S2/S3/S4/S5)") {
    withConn { conn =>
      // the pinned SQL must parse and execute on a real server
      assert(JdbcCatalog.listTables(conn) != null)
      val dbs = JdbcCatalog.listDatabases(conn)
      assert(dbs.forall(d => d.name != "postgres" && d.name != "rdsadmin"))
    }
  }

  test("jsonb model round-trips: DDL, upsert, re-upsert, delete (K1/K5/K7)") {
    withConn { conn =>
      val table = "graft_it_jsonb"
      JdbcUpsertWriter.executeDdl(Seq(s"""DROP TABLE IF EXISTS "$table""""), conn)
      JdbcUpsertWriter.executeDdl(UpsertSql.jsonbTableDdl(table), conn)
      try {
        val st = conn.prepareStatement(UpsertSql.jsonbUpsertStatement(table, 2))
        st.setString(1, "1"); st.setString(2, """{"v":1}"""); st.setString(3, "sqlite")
        st.setString(4, "2"); st.setString(5, """{"v":2}"""); st.setString(6, "sqlite")
        st.executeUpdate(); st.close()
        // idempotent replay: same ids, new payloads
        val st2 = conn.prepareStatement(UpsertSql.jsonbUpsertStatement(table, 1))
        st2.setString(1, "1"); st2.setString(2, """{"v":10}"""); st2.setString(3, "sqlite")
        st2.executeUpdate(); st2.close()
        val rs = conn.createStatement().executeQuery(
          s"""SELECT count(*), max((data->>'v')::int) FROM "$table"""")
        rs.next()
        assert(rs.getLong(1) == 2L && rs.getInt(2) == 10)
      } finally {
        JdbcUpsertWriter.executeDdl(Seq(s"""DROP TABLE IF EXISTS "$table""""), conn)
      }
    }
  }

  test("COPY bulk load lands rows through the real CopyManager (K2)") {
    withConn { conn =>
      val hasDriver =
        try { Class.forName("org.postgresql.copy.CopyManager"); true }
        catch { case _: ClassNotFoundException => false }
      if (!hasDriver) cancel("PostgreSQL driver not on runtime classpath")
      val table = "graft_it_copy"
      JdbcUpsertWriter.executeDdl(Seq(s"""DROP TABLE IF EXISTS "$table""""), conn)
      JdbcUpsertWriter.executeDdl(UpsertSql.jsonbTableDdl(table), conn)
      try {
        val lines = Seq(
          CopyLoader.formatRow("1", """{"a":1}""", "sqlite"),
          // escaped literal backslash inside valid JSON exercises the escaping
          CopyLoader.formatRow("2", """{"path":"C:\\tmp"}""", "sqlite"))
        val n = CopyLoader.PgCopyApi.copyIn(conn, CopyLoader.copySql(table),
          Iterator(lines.mkString.getBytes("UTF-8")))
        assert(n == 2L)
      } finally {
        JdbcUpsertWriter.executeDdl(Seq(s"""DROP TABLE IF EXISTS "$table""""), conn)
      }
    }
  }
}

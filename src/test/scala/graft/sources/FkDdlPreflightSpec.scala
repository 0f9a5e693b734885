package graft.sources

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.MockJdbc
import graft.core.Preflight
import graft.sinks.DdlGen
import graft.sources.FkGraph.FkEdge

class FkDdlPreflightSpec extends AnyFunSuite {

  // ---- FkGraph --------------------------------------------------------

  private val edges = Seq(
    FkEdge("public.orders", "public.customer"),
    FkEdge("public.lineitem", "public.orders"),
    FkEdge("public.lineitem", "public.part"),
    FkEdge("public.customer", "public.nation"))

  test("cascadeClosure finds transitive referencing tables (filtered.rs:28-64)") {
    assert(FkGraph.cascadeClosure(edges, "public.customer") ==
      Set("public.orders", "public.lineitem"))
    assert(FkGraph.cascadeClosure(edges, "public.part") == Set("public.lineitem"))
    assert(FkGraph.cascadeClosure(edges, "public.lineitem") == Set.empty)
  }

  test("cascade safety aborts when blast radius leaves the copy scope") {
    val scope = Set("public.customer", "public.orders") // lineitem missing!
    val res = FkGraph.checkCascadeSafety(scope, edges, Set("public.customer"))
    assert(res.isLeft && res.swap.toOption.get.contains("public.lineitem"))
    assert(FkGraph.checkCascadeSafety(
      scope + "public.lineitem", edges, Set("public.customer")).isRight)
  }

  test("topoOrder writes parents before children (restore.rs:180-198)") {
    val tables = Seq("public.lineitem", "public.orders", "public.customer",
      "public.nation", "public.part")
    val order = FkGraph.topoOrder(tables, edges)
    def pos(t: String) = order.indexOf(t)
    assert(pos("public.nation") < pos("public.customer"))
    assert(pos("public.customer") < pos("public.orders"))
    assert(pos("public.orders") < pos("public.lineitem"))
    assert(pos("public.part") < pos("public.lineitem"))
    assert(order.toSet == tables.toSet)
  }

  test("topoOrder tolerates FK cycles (deferred-constraint tables)") {
    val cyc = Seq(FkEdge("a", "b"), FkEdge("b", "a"), FkEdge("c", "a"))
    val order = FkGraph.topoOrder(Seq("a", "b", "c"), cyc)
    assert(order.toSet == Set("a", "b", "c")) // everyone still present
  }

  test("cascadeTargets executes the recursive CTE and parses pairs") {
    val key = "fk-cte"; MockJdbc.reset(key)
    MockJdbc.setQueryHandler(key, _ => Seq(Seq("public", "orders"), Seq("public", "lineitem")))
    val out = FkGraph.cascadeTargets(MockJdbc.connection(key), "public", "customer")
    assert(out == List(("public", "orders"), ("public", "lineitem")))
    assert(FkGraph.cascadeTargetsSql("public", "customer").contains("WITH RECURSIVE"))
    assert(FkGraph.cascadeTargetsSql("public", "cu'stomer").contains("'cu''stomer'"))
  }

  // ---- DdlGen ---------------------------------------------------------

  test("createTableDdl maps Spark types to PG types with PK") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType),
      StructField("price", DecimalType(12, 2)),
      StructField("created", TimestampType),
      StructField("tags", ArrayType(StringType)),
      StructField("payload", BinaryType)))
    val ddl = DdlGen.createTableDdl("items", schema, Seq("id"))
    assert(ddl ==
      """CREATE TABLE IF NOT EXISTS "items" (
        |  "id" bigint,
        |  "name" text,
        |  "price" numeric(12,2),
        |  "created" timestamptz,
        |  "tags" text[],
        |  "payload" bytea,
        |  PRIMARY KEY ("id")
        |)""".stripMargin)
  }

  test("maintenance DDL matches the reference statements (K8/K9/K13)") {
    assert(DdlGen.truncateSql("t") == """TRUNCATE TABLE "t" RESTART IDENTITY CASCADE""")
    assert(DdlGen.dropTableSql("t") == """DROP TABLE IF EXISTS "t" CASCADE""")
    assert(DdlGen.createDatabaseSql("app", Some("bob")) ==
      """CREATE DATABASE "app" OWNER "bob"""")
    assert(DdlGen.dropDatabaseSql("app") == """DROP DATABASE IF EXISTS "app"""")
    assert(DdlGen.terminateBackendsSql("a'pp").contains("'a''pp'"))
  }

  // ---- Preflight ------------------------------------------------------

  test("preflight collects all failures instead of dying on the first") {
    val key = "preflight"; MockJdbc.reset(key)
    MockJdbc.setQueryHandler(key, sql =>
      if (sql.contains("server_version")) Seq(Seq("16.3"))
      else if (sql.contains("has_table_privilege") && sql.contains("secret"))
        Seq(Seq("false"))
      else if (sql.contains("has_table_privilege")) Seq(Seq("true"))
      else Seq(Seq("1")))
    val results = Preflight.runSourceChecks(MockJdbc.connection(key),
      Seq(("public", "open"), ("public", "secret")))
    assert(results.size == 4)
    assert(results.count(_.ok) == 3)
    assert(!Preflight.allOk(results))
    assert(results.find(!_.ok).get.name == "select:public.secret")
  }

  test("version check enforces the minimum major") {
    val key = "preflight-v"; MockJdbc.reset(key)
    MockJdbc.setQueryHandler(key, _ => Seq(Seq("9.6")))
    assert(!Preflight.checkVersion(MockJdbc.connection(key), minMajor = 10).ok)
    MockJdbc.setQueryHandler(key, _ => Seq(Seq("16.3")))
    assert(Preflight.checkVersion(MockJdbc.connection(key), minMajor = 10).ok)
  }

  test("privilege probes parse boolean shapes (t/true/1)") {
    val key = "preflight-b"; MockJdbc.reset(key)
    MockJdbc.setQueryHandler(key, _ => Seq(Seq("t")))
    assert(Preflight.checkCreateDb(MockJdbc.connection(key)).ok)
    MockJdbc.setQueryHandler(key, _ => Seq(Seq("false")))
    assert(!Preflight.checkReplicationPriv(MockJdbc.connection(key)).ok)
  }
}

package graft.sinks

import java.sql.SQLException

import org.scalatest.funsuite.AnyFunSuite

import graft.{MockJdbc, SparkTestSession}

/** Executor tests against the recording mock Connection — mirrors the
  * reference's SQL-builder and batching unit tests
  * (`src/xmin/writer.rs:575-664`). */
class JdbcWriterSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark

  test("upsertBatchRows honors both the 65000-param and 100-row caps") {
    assert(UpsertSql.upsertBatchRows(3) == 100) // row cap binds
    assert(UpsertSql.upsertBatchRows(650) == 100) // exactly at the cap
    assert(UpsertSql.upsertBatchRows(700) == 92) // param cap binds: 65000/700
    assert(UpsertSql.upsertBatchRows(70000) == 1) // never zero
  }

  test("upsertStatement: ON CONFLICT DO UPDATE with non-pk columns") {
    val sql = UpsertSql.upsertStatement("t", Seq("id", "a", "b"), Seq("id"), 2)
    assert(sql ==
      """INSERT INTO "t" ("id", "a", "b") VALUES (?, ?, ?), (?, ?, ?) """ +
        """ON CONFLICT ("id") DO UPDATE SET "a" = EXCLUDED."a", "b" = EXCLUDED."b"""")
  }

  test("upsertStatement: all-PK table degrades to DO NOTHING (writer.rs:292-296)") {
    val sql = UpsertSql.upsertStatement("t", Seq("a", "b"), Seq("a", "b"), 1)
    assert(sql.endsWith("""ON CONFLICT ("a", "b") DO NOTHING"""))
  }

  test("deleteStatement: single-column IN list and composite tuple IN") {
    assert(UpsertSql.deleteStatement("t", Seq("id"), 3) ==
      """DELETE FROM "t" WHERE "id" IN (?, ?, ?)""")
    assert(UpsertSql.deleteStatement("t", Seq("a", "b"), 2) ==
      """DELETE FROM "t" WHERE ("a", "b") IN ((?, ?), (?, ?))""")
  }

  test("executeUpsertWithSplit binds rows in order and executes one batch") {
    val key = "split-ok"; MockJdbc.reset(key)
    val conn = MockJdbc.connection(key)
    JdbcUpsertWriter.executeUpsertWithSplit(conn, "t", Seq("id", "v"), Seq("id"),
      Seq(Seq(1, "a"), Seq(2, "b")))
    val recs = MockJdbc.recorded(key)
    assert(recs.size == 1)
    assert(recs.head.params == Map(1 -> 1, 2 -> "a", 3 -> 2, 4 -> "b"))
  }

  test("executeUpsertWithSplit halves on failure and isolates the poison row") {
    val key = "split-poison"; MockJdbc.reset(key)
    MockJdbc.setPoison(key, "POISON")
    val conn = MockJdbc.connection(key)
    val rows = (1 to 7).map(i => Seq[Any](i, s"v$i")) :+ Seq[Any](8, "POISON")
    val e = intercept[SQLException] {
      JdbcUpsertWriter.executeUpsertWithSplit(conn, "t", Seq("id", "v"), Seq("id"), rows)
    }
    assert(e.getMessage.contains("poison"))
    // every non-poison row before the poison row still landed, in halved batches
    val landed = MockJdbc.recorded(key).flatMap(_.params.values).collect { case i: Int => i }
    assert(landed.toSet == (1 to 7).toSet)
  }

  test("non-value-too-large SQLExceptions rethrow immediately — no split (writer.rs:117)") {
    val key = "split-rethrow"; MockJdbc.reset(key)
    MockJdbc.setPoison(key, "POISON")
    MockJdbc.setPoisonError(key, "duplicate key value violates unique constraint", "23505")
    val conn = MockJdbc.connection(key)
    val rows = (1 to 7).map(i => Seq[Any](i, s"v$i")) :+ Seq[Any](8, "POISON")
    val e = intercept[SQLException] {
      JdbcUpsertWriter.executeUpsertWithSplit(conn, "t", Seq("id", "v"), Seq("id"), rows)
    }
    assert(e.getSQLState == "23505")
    // the batch failed ONCE and propagated — nothing landed, no 2N retries
    assert(MockJdbc.recorded(key).isEmpty)
    // the classifier itself
    assert(JdbcUpsertWriter.isValueTooLarge(new SQLException("x", "22001")))
    assert(JdbcUpsertWriter.isValueTooLarge(
      new SQLException("db error: value too large to transmit", "XX000")))
    assert(!JdbcUpsertWriter.isValueTooLarge(new SQLException("deadlock", "40P01")))
  }

  test("upsert over a DataFrame drains every row through foreachPartition") {
    val key = "df-upsert"; MockJdbc.reset(key)
    val s = spark
    import s.implicits._
    val df = (1 to 250).map(i => (i, s"name$i")).toDF("id", "name").repartition(3)
    JdbcUpsertWriter.upsert(df, "people", Seq("id"), MockJdbc.factory(key))
    val recs = MockJdbc.recorded(key)
    val boundIds = recs.flatMap(r => r.params.toSeq.sortBy(_._1).map(_._2))
      .collect { case i: Int => i }
    assert(boundIds.toSet == (1 to 250).toSet)
    // 2 params/row, cap 100 rows/statement → every statement ≤ 200 params
    assert(recs.forall(_.params.size <= 200))
    assert(recs.forall(_.sql.startsWith("""INSERT INTO "people"""")))
    assert(MockJdbc.connectionsOpened(key) >= 1)
  }

  test("delete batches PKs 1000 per statement (writer.rs:221)") {
    val key = "df-delete"; MockJdbc.reset(key)
    val s = spark
    import s.implicits._
    val df = (1 to 2500).map(i => Tuple1(i)).toDF("id").coalesce(1)
    JdbcUpsertWriter.delete(df, "people", Seq("id"), MockJdbc.factory(key))
    val recs = MockJdbc.recorded(key)
    assert(recs.map(_.params.size).sorted == List(500, 1000, 1000))
    assert(recs.forall(_.sql.startsWith("""DELETE FROM "people" WHERE "id" IN""")))
  }

  test("writeJsonbModel executes DDL then jsonb upserts") {
    val key = "jsonb-model"; MockJdbc.reset(key)
    val s = spark
    import s.implicits._
    val df = Seq(("1", """{"a":1}""", "sqlite"), ("2", """{"a":2}""", "sqlite"))
      .toDF("id", "data", "_source_type").coalesce(1)
    JdbcUpsertWriter.writeJsonbModel(df, "docs", MockJdbc.factory(key))
    val recs = MockJdbc.recorded(key)
    assert(recs.head.sql.contains("CREATE TABLE IF NOT EXISTS \"docs\""))
    assert(recs.map(_.sql).exists(_.contains("USING GIN (data)")))
    val upserts = recs.filter(_.sql.startsWith("INSERT INTO"))
    assert(upserts.nonEmpty)
    assert(upserts.head.sql.contains("(?, ?::jsonb, ?)"))
    assert(upserts.head.sql.contains("ON CONFLICT (id) DO UPDATE SET data = EXCLUDED.data"))
    assert(upserts.flatMap(_.params.values).count(_ == "sqlite") == 2)
  }
}

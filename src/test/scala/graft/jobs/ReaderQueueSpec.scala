package graft.jobs

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{MockJdbc, SparkTestSession}
import graft.core.BatchSizing
import graft.jsonb.JsonbIngestJob
import graft.operators.Checksum
import graft.snapshot.SnapshotJob
import graft.sources.KeysetReader
import graft.streaming.{ChangeQueue, SyncStateStore}

class ReaderQueueSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark

  // ---- KeysetReader ---------------------------------------------------

  test("keyset pages survive duplicate versions via the tiebreak") {
    val s = spark
    import s.implicits._
    // many rows share version=5 — a version-only cursor would skip or loop
    val df = (1L to 30L).map(i => (if (i <= 20) 5L else i, i)).toDF("v", "t")
    val pageSizes = KeysetReader.pages(df, "v", "t", batchSize = 7)
      .map(_.count()).toList
    assert(pageSizes.sum == 30)
    assert(pageSizes.forall(_ <= 7))
    // every row delivered exactly once
    val seen = KeysetReader.pages(df, "v", "t", batchSize = 7)
      .flatMap(_.select("t").collect().map(_.getLong(0))).toList
    assert(seen.sorted == (1L to 30L).toList)
    assert(seen.size == seen.distinct.size)
  }

  test("keyset resume from a cursor skips already-read rows") {
    val s = spark
    import s.implicits._
    val df = (1L to 10L).map(i => (i, i * 10)).toDF("v", "t")
    val (first, cur) = KeysetReader.readPage(df, "v", "t", None, 4)
    assert(first.count() == 4 && cur.contains(KeysetReader.Cursor(4L, 40L)))
    val (second, _) = KeysetReader.readPage(df, "v", "t", cur, 4)
    assert(second.select(min(col("v"))).head().getLong(0) == 5L)
  }

  // ---- ChangeQueue ----------------------------------------------------

  private def queueDf() = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "users", "insert", "u1", "a"),
      (2L, "users", "update", "u1", "b"),
      (3L, "orders", "insert", "o1", "x"),
      (4L, "users", "delete", "u2", ""),
      (5L, "orders", "update", "o1", "y"))
      .toDF("change_id", "table_name", "op", "primary_key", "payload")
  }

  test("consumeOnce applies latest-per-key per table and acks the cursor") {
    val store = new SyncStateStore(Files.createTempDirectory("cq").resolve("s.jsonl"))
    var applied = Map.empty[String, (Set[String], Set[String])]
    val n = ChangeQueue.consumeOnce(queueDf(), store, "q", "main", limit = 10) {
      (table, up, del) =>
        applied += table -> (
          up.select("primary_key").collect().map(_.getString(0)).toSet,
          del.select("primary_key").collect().map(_.getString(0)).toSet)
    }
    assert(n == 5)
    // users: u1 upserted (change 2 wins over 1), u2 deleted
    assert(applied("users") == (Set("u1"), Set("u2")))
    // orders: o1 upserted (change 5 wins)
    assert(applied("orders") == (Set("o1"), Set.empty[String]))
    assert(store.watermark("q", "main") == 5L)
    // caught up: nothing more, cursor unchanged
    assert(ChangeQueue.consumeOnce(queueDf(), store, "q", "main", 10)((_, _, _) => ()) == 0L)
  }

  test("the listed page is persisted for the split and released after consume") {
    // persisted while live: the N-table split + stats reuse one execution
    val batch = ChangeQueue.listChanges(queueDf(), cursor = 0L, limit = 10).get
    assert(batch.changes.storageLevel.useMemory || batch.changes.storageLevel.useDisk)
    batch.release()
    assert(batch.changes.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
    // consumeOnce releases automatically (even if apply throws)
    val store = new SyncStateStore(Files.createTempDirectory("cqp").resolve("s.jsonl"))
    ChangeQueue.consumeOnce(queueDf(), store, "q", "m", 10)((_, _, _) => ())
    intercept[RuntimeException] {
      ChangeQueue.consumeOnce(queueDf().withColumn("change_id", col("change_id") + 100),
        store, "q", "m", 10)((_, _, _) => throw new RuntimeException("boom"))
    }
  }

  test("limit bounds a consume batch and the cursor resumes mid-queue") {
    val store = new SyncStateStore(Files.createTempDirectory("cq2").resolve("s.jsonl"))
    val n1 = ChangeQueue.consumeOnce(queueDf(), store, "q", "m", limit = 2)((_, _, _) => ())
    assert(n1 == 2 && store.watermark("q", "m") == 2L)
    val n2 = ChangeQueue.consumeOnce(queueDf(), store, "q", "m", limit = 10)((_, _, _) => ())
    assert(n2 == 3 && store.watermark("q", "m") == 5L)
  }

  test("CDC queue drains end-to-end into the JDBC upsert/delete executor") {
    val store = new SyncStateStore(Files.createTempDirectory("cq3").resolve("s.jsonl"))
    val key = "cdc-jdbc"; graft.MockJdbc.reset(key)
    val n = ChangeQueue.consumeOnce(queueDf(), store, "q", "main", limit = 10) {
      (table, up, del) =>
        graft.sinks.JdbcUpsertWriter.upsert(
          up.select("primary_key", "payload"), table, Seq("primary_key"),
          graft.MockJdbc.factory(key))
        graft.sinks.JdbcUpsertWriter.delete(
          del.select("primary_key"), table, Seq("primary_key"),
          graft.MockJdbc.factory(key))
    }
    assert(n == 5)
    val recs = graft.MockJdbc.recorded(key)
    val upserts = recs.filter(_.sql.startsWith("INSERT INTO"))
    val deletes = recs.filter(_.sql.startsWith("DELETE FROM"))
    assert(upserts.map(_.sql).exists(_.contains("\"users\"")))
    assert(upserts.map(_.sql).exists(_.contains("\"orders\"")))
    assert(deletes.map(_.sql).exists(_.contains("\"users\"")))
    // latest-wins: u1's bound payload is 'b' (change 2), never 'a'
    assert(upserts.flatMap(_.params.values).contains("b"))
    assert(!upserts.flatMap(_.params.values).contains("a"))
  }

  // ---- JsonbIngestJob -------------------------------------------------

  test("jsonb ingest: documents carry tagged data without the synthetic id") {
    val s = spark
    import s.implicits._
    val df = Seq((10L, "alice"), (20L, "bob")).toDF("id", "name")
    val (docs, idName) = JsonbIngestJob.toDocuments(df, None, "sqlite")
    assert(idName == "id")
    val r = docs.orderBy("id").head()
    assert(r.getString(0) == "10")
    assert(r.getString(1) == """{"id":10,"name":"alice"}""")
    assert(r.getString(2) == "sqlite")
  }

  test("jsonb ingest end-to-end through the JDBC executor (mock)") {
    val key = "jsonb-job"; MockJdbc.reset(key)
    val s = spark
    import s.implicits._
    val df = Seq((1L, "x"), (2L, "y")).toDF("k", "v").coalesce(1)
    val report = JsonbIngestJob.run(df, "docs_t", None, "mysql", MockJdbc.factory(key))
    assert(report.rows == 2 && report.idColumn == "<row_number>")
    val recs = MockJdbc.recorded(key)
    assert(recs.head.sql.contains("CREATE TABLE IF NOT EXISTS \"docs_t\""))
    val upserted = recs.filter(_.sql.startsWith("INSERT")).flatMap(_.params.values)
    assert(upserted.count(_ == "mysql") == 2)
    intercept[IllegalArgumentException] {
      JsonbIngestJob.run(df, "bad;name", None, "mysql", MockJdbc.factory(key))
    }
  }

  // ---- RestoreJob -----------------------------------------------------

  test("restore executes schema DDL then loads tables in FK order") {
    val s = spark
    import s.implicits._
    import graft.snapshot.RestoreJob
    import graft.sources.FkGraph.FkEdge
    val src = Files.createTempDirectory("restore").toString
    Seq((1L, "n")).toDF("nation_id", "name").write.parquet(s"$src/nation.parquet")
    Seq((1L, 1L)).toDF("cust_id", "nation_id").write.parquet(s"$src/customer.parquet")
    val key = "restore"; MockJdbc.reset(key)
    val report = RestoreJob.run(s, src,
      Seq(RestoreJob.TableSpec("customer", Seq("cust_id")),
        RestoreJob.TableSpec("nation", Seq("nation_id"))),
      Seq(FkEdge("customer", "nation")),
      MockJdbc.factory(key))
    assert(report.ordered == Seq("nation", "customer")) // parent first
    assert(report.rows == Map("nation" -> 1L, "customer" -> 1L))
    val recs = MockJdbc.recorded(key)
    val ddl = recs.takeWhile(_.sql.startsWith("CREATE TABLE"))
    assert(ddl.size == 2 && ddl.head.sql.contains("\"nation\""))
    val inserts = recs.map(_.sql).filter(_.startsWith("INSERT"))
    assert(inserts.indexWhere(_.contains("\"nation\"")) <
      inserts.indexWhere(_.contains("\"customer\"")))
  }

  // ---- BatchSizing / Checksum guard / parallel verify -----------------

  test("optimal batch size clamps to [1000, 50000] (utils.rs:1545-1578)") {
    assert(BatchSizing.optimalBatchSize(1L << 20) == 1000) // tiny mem → floor
    assert(BatchSizing.optimalBatchSize(8L << 30) == 50000) // huge mem → cap
    assert(BatchSizing.optimalBatchSize(400L << 20) == 50000) // 400MB/4/2KB = 51200 → capped
    assert(BatchSizing.optimalBatchSize(160L << 20) == 20480) // in-range
    assert(BatchSizing.byteAwareBatchRows(avgRowBytes = 1 << 20) == 10) // 10MB/1MB
    assert(BatchSizing.byteAwareBatchRows(avgRowBytes = 10) == 1000) // row cap
  }

  test("orderedChecksum refuses unboundedly large tables") {
    val s = spark
    val big = s.range(Checksum.OrderedChecksumMaxRows + 1).toDF("id")
    intercept[IllegalArgumentException] { Checksum.orderedChecksum(big) }
  }

  test("verifyDirs compares tables 4-way parallel and flags mismatches") {
    val s = spark
    import s.implicits._
    val a = Files.createTempDirectory("va").toString
    val b = Files.createTempDirectory("vb").toString
    Seq((1, "x")).toDF("id", "v").write.parquet(s"$a/t1.parquet")
    Seq((1, "x")).toDF("id", "v").write.parquet(s"$b/t1.parquet")
    Seq((2, "y")).toDF("id", "v").write.parquet(s"$a/t2.parquet")
    Seq((2, "z")).toDF("id", "v").write.parquet(s"$b/t2.parquet")
    val res = SnapshotJob.verifyDirs(s, a, b, Seq("t1", "t2"))
    assert(res == Map("t1" -> true, "t2" -> false))
  }
}

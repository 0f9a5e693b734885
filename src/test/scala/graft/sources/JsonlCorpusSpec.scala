package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class JsonlCorpusSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark
  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix)

  test("JSONL corpus round-trips with exact schema and O(1) row count") {
    val s = spark
    val docs = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = tmp("jsonl-rt").resolve("corpus").toString
    val written = JsonlCorpus.write(docs, dir, nShards = 4, shardKey = Seq("doc_id"))
    assert(written == docs.count())
    assert(JsonlCorpus.rowCount(s, dir).contains(written))
    val back = JsonlCorpus.read(s, dir)
    // exact schema — not JSON re-inference (which would widen/reorder)
    assert(back.schema == docs.schema)
    val a = docs.orderBy("doc_id").collect().map(_.toSeq)
    val b = back.orderBy("doc_id").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("sharding is deterministic: same corpus, same shard contents") {
    val s = spark
    val docs = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "lang")
    val d1 = tmp("jsonl-d1").resolve("c").toString
    val d2 = tmp("jsonl-d2").resolve("c").toString
    JsonlCorpus.write(docs, d1, nShards = 4, shardKey = Seq("doc_id"))
    JsonlCorpus.write(docs, d2, nShards = 4, shardKey = Seq("doc_id"))
    def shardSets(dir: String): Set[Set[Long]] = {
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".json.gz")).map(_.getAbsolutePath)
      assert(files.length == 4)
      files.map { f =>
        s.read.schema(docs.schema).json(f)
          .select("doc_id").collect().map(_.getLong(0)).toSet
      }.toSet
    }
    assert(shardSets(d1) == shardSets(d2))
  }
}

package graft.sources

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.jsonb.MongoIngest

/** Mongo reader surface (S18–S20) against a recording mock client —
  * the same treatment the JDBC executors get (no live Mongo in the
  * sandbox), pinned to `src/mongodb/reader.rs` + `converter.rs:236-260`. */
class MongoCatalogSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark

  /** Parse Extended-JSON docs the way readCollection does. */
  private def jsonDf(docs: String*) = {
    val s = spark
    s.read.json(s.createDataset(docs.toSeq)(org.apache.spark.sql.Encoders.STRING))
  }

  private class MockMongo(collections: Seq[String],
                          docs: Map[String, Seq[String]]) extends MongoClientContract {
    val calls = ListBuffer.empty[String]
    def listCollectionNames(db: String): Seq[String] = {
      calls += s"list:$db"; collections
    }
    def estimatedDocumentCount(db: String, coll: String): Long = {
      calls += s"count:$db.$coll"; docs.getOrElse(coll, Nil).size.toLong
    }
    def findAll(db: String, coll: String): Iterator[String] = {
      calls += s"find:$db.$coll"; docs.getOrElse(coll, Nil).iterator
    }
  }

  test("listCollections excludes system.* (reader.rs:49-53)") {
    val m = new MockMongo(
      Seq("users", "system.indexes", "events", "system.profile"), Map.empty)
    assert(MongoCatalog.listCollections(m, "mydb") == Seq("users", "events"))
    assert(m.calls.toList == List("list:mydb"))
  }

  test("count and read validate the collection name before touching the driver") {
    val m = new MockMongo(Nil, Map("users" -> Seq("""{"_id":"u1","n":1}""")))
    assert(MongoCatalog.collectionCount(m, "mydb", "users") == 1L)
    intercept[IllegalArgumentException] {
      MongoCatalog.collectionCount(m, "mydb", "users; DROP TABLE x")
    }
    intercept[IllegalArgumentException] {
      MongoCatalog.readCollection(spark, m, "mydb", "../../etc/passwd")
    }
    // the invalid names never reached the mock
    assert(m.calls.toList == List("count:mydb.users"))
  }

  test("readCollection drains the cursor into an inferred-schema frame (reader.rs:153-193)") {
    val m = new MockMongo(Nil, Map("events" -> Seq(
      """{"_id":{"$oid":"64b000000000000000000001"},"kind":"click","n":3}""",
      """{"_id":{"$oid":"64b000000000000000000002"},"kind":"view","n":5}""")))
    val df = MongoCatalog.readCollection(spark, m, "mydb", "events")
    assert(df.count() == 2)
    assert(df.select(sum(col("n"))).head().getLong(0) == 8L)
    assert(df.schema("_id").dataType.typeName == "struct")
  }

  test("_id dispatch: ObjectId → hex, String → as-is, Int → decimal string") {
    val oid = MongoIngest.withMongoId(jsonDf(
      """{"_id":{"$oid":"64b000000000000000000007"},"v":1}"""))
    assert(oid.select("__id").head().getString(0) == "64b000000000000000000007")

    val str = MongoIngest.withMongoId(jsonDf(
      """{"_id":"custom-key","v":1}"""))
    assert(str.select("__id").head().getString(0) == "custom-key")

    val num = MongoIngest.withMongoId(jsonDf(
      """{"_id":42,"v":1}"""))
    assert(num.select("__id").head().getString(0) == "42")
  }

  test("_id dispatch: unsupported type / missing _id falls back to doc number") {
    // double _id is not in the reference's supported list → doc number
    val dbl = MongoIngest.withMongoId(jsonDf(
      """{"_id":1.5,"v":"a"}""", """{"_id":2.5,"v":"b"}"""))
    assert(dbl.select("__id").collect().map(_.getString(0)).toSet == Set("1", "2"))

    // no _id at all → doc numbers 1..n (converter.rs:252-259)
    val none = MongoIngest.withMongoId(jsonDf(
      """{"v":"x"}""", """{"v":"y"}""", """{"v":"z"}"""))
    assert(none.select("__id").collect().map(_.getString(0)).toSet == Set("1", "2", "3"))

    // per-row missing oid inside an ObjectId column → number for that row only
    val mixed = MongoIngest.withMongoId(jsonDf(
      """{"_id":{"$oid":"64b00000000000000000000a"},"v":"has"}""",
      """{"v":"missing"}"""))
    val byV = mixed.select("v", "__id").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(byV("has") == "64b00000000000000000000a")
    assert(byV("missing").forall(_.isDigit))
  }

  test("toDocuments emits the reference's ObjectId/datetime tags (converter.rs:69-83)") {
    val df = jsonDf(
      """{"_id":{"$oid":"64b000000000000000000001"},"name":"n1","at":{"$date":1700000000000},"n":7}""")
    val docs = MongoIngest.toDocuments(df)
    val row = docs.head()
    assert(row.getAs[String]("id") == "64b000000000000000000001")
    val data = row.getAs[String]("data")
    assert(data.contains(""""_id":{"_type":"objectid","$oid":"64b000000000000000000001"}"""))
    assert(data.contains(""""at":{"_type":"datetime","$date":1700000000000}"""))
    assert(data.contains(""""name":"n1""""))
    assert(data.contains(""""n":7"""))
    assert(row.getAs[String]("_source_type") == "mongodb")
  }

  test("readCollectionRaw streams through a spool: one cursor drain, re-reads never re-query") {
    val docs = Seq("""{"_id":"u1","n":1}""", """{"_id":"u2","n":2}""")
    val m = new MockMongo(Nil, Map("users" -> docs))
    val ds = MongoCatalog.readCollectionRaw(spark, m, "mydb", "users")
    // the cursor is drained to local disk exactly once, at call time —
    // constant driver memory (one document in flight), and the returned
    // Dataset reads the spool lazily
    assert(m.calls.count(_.startsWith("find:")) == 1)
    assert(ds.collect().toSeq == docs)
    ds.collect()
    assert(m.calls.count(_.startsWith("find:")) == 1,
      "re-collect re-drained the source cursor instead of the spool")
  }

  test("readCollectionRaw spools to a shared-filesystem dir when given one") {
    val docs = Seq("""{"_id":"u1","n":1}""", """{"_id":"u2","n":2}""")
    val m = new MockMongo(Nil, Map("users" -> docs))
    val shared = java.nio.file.Files.createTempDirectory("mongo-spool").toString
    // local path stands in for an HDFS/object-store URI: the spool goes
    // through the Hadoop FileSystem API either way, which is what makes
    // the drain usable on a cluster (executors can't read driver /tmp)
    val ds = MongoCatalog.readCollectionRaw(spark, m, "mydb", "users",
      spoolDir = Some(shared))
    assert(ds.collect().toSeq == docs)
    val spooled = new java.io.File(shared).listFiles().filter(_.getName.endsWith(".jsonl"))
    assert(spooled.length == 1, "spool file not under the requested dir")
    assert(m.calls.count(_.startsWith("find:")) == 1)
  }

  test("readCollectionRaw refuses a collection too big to drain on the driver") {
    val m = new MockMongo(Nil, Map("big" -> Seq("""{"_id":1}""", """{"_id":2}""")))
    // mock reports 2 docs; cap at 1 → the drain must refuse BEFORE find()
    val e = intercept[IllegalArgumentException] {
      MongoCatalog.readCollectionRaw(spark, m, "mydb", "big", maxDriverRows = 1L)
    }
    assert(e.getMessage.contains("readCollectionPartitioned"))
    assert(m.calls.toList == List("count:mydb.big")) // cursor never opened
  }

  test("default findSplit is disjoint and covering") {
    val docs = (1 to 10).map(i => s"""{"_id":$i}""")
    val m = new MockMongo(Nil, Map("c" -> docs))
    val splits = (0 until 3).map(i => m.findSplit("db", "c", i, 3).toSeq)
    assert(splits.flatten.sorted == docs.sorted)                  // covering
    assert(splits.map(_.toSet).reduce(_ intersect _).isEmpty)     // disjoint
  }

  test("partitioned read matches the cursor drain and never lands on the driver") {
    val docs = (1 to 20).map(i =>
      s"""{"_id":{"$$oid":"${"%024x".format(i)}"},"n":$i}""")
    val data = Map("events" -> docs)
    val factory = new MockFactory(data)
    val part = MongoCatalog.readCollectionPartitionedRaw(spark, factory,
      "mydb", "events", nSplits = 4)
    // distribution: the read plans as nSplits partitions, each draining
    // its own split cursor — no driver-side materialization anywhere
    assert(part.rdd.getNumPartitions == 4)
    val drained = MongoCatalog.readCollectionRaw(spark,
      new MockMongo(Nil, data), "mydb", "events").collect().sorted
    assert(part.collect().sorted.toSeq == drained.toSeq)
    // typed form agrees with the drain-based reader
    val typedPart = MongoCatalog.readCollectionPartitioned(spark, factory,
      "mydb", "events", nSplits = 4)
    assert(typedPart.count() == 20)
    assert(typedPart.select(sum(col("n"))).head().getLong(0) == (1 to 20).sum.toLong)
    // name validation happens before any task launches
    intercept[IllegalArgumentException] {
      MongoCatalog.readCollectionPartitionedRaw(spark, factory, "mydb",
        "bad; name", 4)
    }
  }

  test("full pipeline: list → read → documents over the mock (S18+S19 end-to-end)") {
    val m = new MockMongo(Seq("users", "system.views"), Map("users" -> Seq(
      """{"_id":{"$oid":"64b0000000000000000000aa"},"email":"a@x.io"}""",
      """{"_id":{"$oid":"64b0000000000000000000bb"},"email":"b@x.io"}""")))
    val colls = MongoCatalog.listCollections(m, "app")
    assert(colls == Seq("users"))
    val docs = MongoIngest.toDocuments(
      MongoCatalog.readCollection(spark, m, "app", colls.head))
    assert(docs.count() == 2)
    assert(docs.select("id").collect().map(_.getString(0)).toSet ==
      Set("64b0000000000000000000aa", "64b0000000000000000000bb"))
  }
}

/** Serializable factory over plain data — clients open executor-side, so
  * nothing observable can be recorded driver-side; the partitioned-read
  * test pins the observable contract instead (distribution + content
  * equality). File-scoped: an inner class would capture the
  * non-serializable suite via `$outer`. */
private class MockFactory(docs: Map[String, Seq[String]]) extends MongoClientFactory {
  def open(): MongoClientContract = new MongoClientContract {
    def listCollectionNames(db: String): Seq[String] = docs.keys.toSeq
    def estimatedDocumentCount(db: String, coll: String): Long =
      docs.getOrElse(coll, Nil).size.toLong
    def findAll(db: String, coll: String): Iterator[String] =
      docs.getOrElse(coll, Nil).iterator
  }
}

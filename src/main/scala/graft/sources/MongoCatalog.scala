package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.core.Identifiers

/** MongoDB reader surface (S18–S20) — reference `src/mongodb/reader.rs`:
  *
  *   - collection listing excluding `system.*` (`reader.rs:37-60`);
  *   - estimated document count, name-validated (`reader.rs:94-117`);
  *   - full collection read (`reader.rs:153-193`) — either the
  *     reference's single cursor drain (small collections, guarded) or a
  *     PARTITIONED read where every Spark task opens its own split cursor.
  *
  * The sandbox has no Mongo driver (and no live Mongo), so — mirroring the
  * MySQL/JDBC treatment, where the SQL text + executors are pinned against
  * a recording mock Connection — the driver surface is expressed as the
  * minimal [[MongoClientContract]] the reference actually uses. In
  * production that trait wraps the Mongo Java driver (documents as
  * canonical Extended JSON via `Document.toJson`), and
  * [[MongoClientContract.findSplit]] maps to the standard split strategies
  * (`$sample`-derived `_id` range bounds, or `splitVector`). Everything
  * downstream of [[readCollection]] (Extended-JSON decode, id dispatch,
  * tagged encode — see [[graft.jsonb.MongoIngest]]) is a distributed
  * DataFrame pipeline that doesn't care which read path produced the rows.
  */
trait MongoClientContract {
  /** All collection names in `database` (unfiltered — the contract the
    * driver's `list_collection_names` provides). */
  def listCollectionNames(database: String): Seq[String]

  /** `estimated_document_count` for one collection. */
  def estimatedDocumentCount(database: String, collection: String): Long

  /** `find({})` cursor drain: every document as an Extended-JSON string. */
  def findAll(database: String, collection: String): Iterator[String]

  /** One split's documents, for a partitioned read: split `i` of
    * `nSplits` must be disjoint across `i` and cover the collection when
    * unioned. A real driver implements this with `_id` range bounds (the
    * connector's partitioner); this default — a deterministic round-robin
    * decimation of the full cursor — preserves the disjoint-and-covering
    * contract for drivers that haven't, at the cost of each split
    * re-scanning the cursor (correct, not fast: override it). */
  def findSplit(database: String, collection: String,
                split: Int, nSplits: Int): Iterator[String] =
    findAll(database, collection).zipWithIndex.collect {
      case (doc, i) if i % nSplits == split => doc
    }
}

/** Serializable handle that opens a client ON THE EXECUTOR — the
  * partitioned read ships this (never a live connection) to tasks, the
  * same connection-per-task discipline as the JDBC readers. */
trait MongoClientFactory extends Serializable {
  def open(): MongoClientContract
}

object MongoCatalog {

  /** Driver-side materialization guard for [[readCollectionRaw]]: above
    * this estimated count the single cursor drain would risk a driver
    * OOM, so the read refuses and points at the partitioned path. */
  val MaxDriverDrainDocs = 1000000L

  private def validated(collection: String): String =
    Identifiers.validateTableName(collection) match {
      case Left(err) => throw new IllegalArgumentException(err)
      case Right(ok) => ok
    }

  /** S18: user collections only — `system.*` excluded (`reader.rs:49-53`). */
  def listCollections(client: MongoClientContract, database: String): Seq[String] =
    client.listCollectionNames(database).filterNot(_.startsWith("system."))

  /** S20: document count; collection name validated first (the same
    * injection guard the reference applies, `reader.rs:96-98`). */
  def collectionCount(client: MongoClientContract, database: String,
                      collection: String): Long =
    client.estimatedDocumentCount(database, validated(collection))

  /** S19 raw form: the cursor drain as a Dataset of Extended-JSON strings
    * (name-validated, read-only — `reader.rs:153-193`). Faithful to the
    * reference's whole-collection drain, but STREAMED, never
    * materialized: the cursor is spooled document-by-document to a temp
    * JSONL file (constant driver memory — one document in flight;
    * Extended JSON is newline-free by construction, strings carry `\n`
    * escaped), which the returned Dataset then reads lazily. The
    * `maxDriverRows` guard stays as the bound on single-cursor drain
    * TIME and spool DISK; collections above it should use
    * [[readCollectionPartitioned]], where no document ever crosses the
    * driver at all.
    *
    * The spool must be READABLE BY EXECUTORS: on a local master the
    * default (a driver temp file) is; on a cluster the driver's /tmp is
    * not, so pass `spoolDir` on a shared filesystem (HDFS / object
    * store) — refused loudly otherwise instead of failing at first
    * action with a FileNotFound on some executor. */
  def readCollectionRaw(spark: SparkSession, client: MongoClientContract,
                        database: String, collection: String,
                        maxDriverRows: Long = MaxDriverDrainDocs,
                        spoolDir: Option[String] = None): Dataset[String] = {
    val coll = validated(collection)
    val estimated = client.estimatedDocumentCount(database, coll)
    require(estimated <= maxDriverRows,
      s"$database.$coll has ~$estimated docs > $maxDriverRows: the single-cursor " +
        "drain spools through the driver — use readCollectionPartitioned")
    require(spark.sparkContext.isLocal || spoolDir.nonEmpty,
      "single-cursor drain spools through the driver's filesystem, which cluster " +
        "executors cannot read — pass spoolDir on a shared filesystem, or use " +
        "readCollectionPartitioned")
    // one drain loop, two spool destinations — only the writer differs
    def drain(w: java.io.BufferedWriter): Unit =
      try client.findAll(database, coll).foreach { doc => w.write(doc); w.newLine() }
      finally w.close()
    val spoolUri = spoolDir match {
      case None =>
        val tmp = java.nio.file.Files.createTempFile(s"graft_mongo_${coll}_", ".jsonl")
        tmp.toFile.deleteOnExit() // the Dataset reads it lazily — keep for the JVM's life
        drain(java.nio.file.Files.newBufferedWriter(tmp,
          java.nio.charset.StandardCharsets.UTF_8))
        tmp.toUri.toString
      case Some(dir) =>
        val p = new org.apache.hadoop.fs.Path(dir,
          s"graft_mongo_${coll}_${java.util.UUID.randomUUID().toString.replace("-", "")}.jsonl")
        val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
        fs.deleteOnExit(p)
        drain(new java.io.BufferedWriter(new java.io.OutputStreamWriter(
          fs.create(p, true), java.nio.charset.StandardCharsets.UTF_8)))
        p.toString
    }
    spark.read.textFile(spoolUri)
  }

  /** S19 typed form: Extended-JSON documents parsed to a DataFrame
    * (schema inferred, as the Spark Mongo connector would produce). */
  def readCollection(spark: SparkSession, client: MongoClientContract,
                     database: String, collection: String): DataFrame =
    spark.read.json(readCollectionRaw(spark, client, database, collection))

  /** S19 at scale: the partitioned read. `nSplits` tasks each open their
    * OWN client (via `factory`, on the executor) and drain only their
    * split cursor — no document ever lands on the driver, and the decode
    * downstream starts already distributed. This is the shape the Spark
    * Mongo connector implements natively; the contract keeps it testable
    * against recording mocks in a driver-less sandbox. */
  def readCollectionPartitionedRaw(spark: SparkSession, factory: MongoClientFactory,
                                   database: String, collection: String,
                                   nSplits: Int): Dataset[String] = {
    import spark.implicits._
    require(nSplits > 0, "nSplits must be positive")
    val coll = validated(collection) // validate BEFORE distributing
    spark.createDataset(0 until nSplits)
      .repartition(nSplits)
      .mapPartitions { splits =>
        splits.flatMap { split =>
          // one client per task, opened executor-side — connections are
          // never serialized, mirroring the JDBC executor discipline
          factory.open().findSplit(database, coll, split, nSplits)
        }
      }
  }

  /** Typed partitioned read (schema inferred from the distributed rows). */
  def readCollectionPartitioned(spark: SparkSession, factory: MongoClientFactory,
                                database: String, collection: String,
                                nSplits: Int): DataFrame =
    spark.read.json(readCollectionPartitionedRaw(spark, factory, database,
      collection, nSplits))
}

package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.core.Identifiers

/** MongoDB reader surface (S18–S20) — reference `src/mongodb/reader.rs`:
  *
  *   - collection listing excluding `system.*` (`reader.rs:37-60`);
  *   - estimated document count, name-validated (`reader.rs:94-117`);
  *   - full collection read via cursor drain (`reader.rs:153-193`).
  *
  * The sandbox has no Mongo driver (and no live Mongo), so — mirroring the
  * MySQL/JDBC treatment, where the SQL text + executors are pinned against
  * a recording mock Connection — the driver surface is expressed as the
  * minimal [[MongoClientContract]] the reference actually uses. In
  * production that trait wraps the Mongo Java driver (documents as
  * canonical Extended JSON via `Document.toJson`); at 100 TB the cursor
  * drain is replaced by the Spark Mongo connector's partitioned read, and
  * everything downstream of [[readCollection]] (Extended-JSON decode, id
  * dispatch, tagged encode — see [[graft.jsonb.MongoIngest]]) is already a
  * distributed DataFrame pipeline that doesn't care which of the two
  * produced the rows.
  */
trait MongoClientContract {
  /** All collection names in `database` (unfiltered — the contract the
    * driver's `list_collection_names` provides). */
  def listCollectionNames(database: String): Seq[String]

  /** `estimated_document_count` for one collection. */
  def estimatedDocumentCount(database: String, collection: String): Long

  /** `find({})` cursor drain: every document as an Extended-JSON string. */
  def findAll(database: String, collection: String): Iterator[String]
}

object MongoCatalog {

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
    * (name-validated, read-only — `reader.rs:153-193`). */
  def readCollectionRaw(spark: SparkSession, client: MongoClientContract,
                        database: String, collection: String): Dataset[String] = {
    import spark.implicits._
    val docs = client.findAll(database, validated(collection)).toSeq
    spark.createDataset(docs)
  }

  /** S19 typed form: Extended-JSON documents parsed to a DataFrame
    * (schema inferred, as the Spark Mongo connector would produce). */
  def readCollection(spark: SparkSession, client: MongoClientContract,
                     database: String, collection: String): DataFrame =
    spark.read.json(readCollectionRaw(spark, client, database, collection))
}

package graft.jsonb

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.sinks.{JdbcUpsertWriter, UpsertSql}
import graft.types.{IdExtraction, TaggedJson}

/** The JSONB ingestion job — the reference's SQLite/Mongo/MySQL → PG
  * pipeline (`src/commands/init.rs:1015-1432` + `src/jsonb/writer.rs`):
  * every source row is erased to the uniform `(id, data JSONB,
  * _source_type, _migrated_at)` document shape with lossless type tags.
  *
  *   1. id extraction: declared PK → verified-unique heuristic column →
  *      stable row number (`src/sqlite/converter.rs:209-297`);
  *   2. tagged-JSON encode of the whole row (§1.3 type tables);
  *   3. DDL + batched idempotent upserts through the JDBC executor.
  *
  * Each stage is a DataFrame transform; the only driver-side work is the
  * uniqueness probe (two counts) and DDL.
  */
object JsonbIngestJob {

  final case class Report(table: String, rows: Long, idColumn: String)

  /** Build the uniform document frame (no I/O — the testable core).
    * `data` encodes only the ORIGINAL columns — the synthetic row-number
    * id must not leak into the document body. */
  def toDocuments(df: DataFrame, declaredPk: Option[String],
                  sourceType: String): (DataFrame, String) = {
    val (withId, idName) = IdExtraction.withId(df, declaredPk)
    val original = df.select(df.columns.toIndexedSeq.map(col): _*)
    val docs = withId.select(
      col("__id").cast("string").as("id"),
      TaggedJson.rowJson(original, mongoStyle = sourceType == "mongodb").as("data"),
      org.apache.spark.sql.functions.lit(sourceType).as("_source_type"))
    (docs, idName)
  }

  /** Full ingest: documents → DDL → upserts via the mock-able JDBC
    * executor (`table` is validated against the identifier rules the
    * reference enforces — `src/jsonb/mod.rs:35-87`). */
  def run(df: DataFrame, table: String, declaredPk: Option[String],
          sourceType: String,
          connFactory: JdbcUpsertWriter.ConnFactory): Report = {
    graft.core.Identifiers.validateTableName(table) match {
      case Left(err) => throw new IllegalArgumentException(err)
      case Right(_)  => ()
    }
    val (docs, idName) = toDocuments(df, declaredPk, sourceType)
    JdbcUpsertWriter.writeJsonbModel(docs, table, connFactory)
    Report(table, df.count(), idName)
  }

  /** The DDL the job issues (exposed for callers/tests). */
  def ddl(table: String): Seq[String] = UpsertSql.jsonbTableDdl(table)
}

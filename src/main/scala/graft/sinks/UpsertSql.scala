package graft.sinks

import graft.core.Identifiers.quoteIdent

/** Generated upsert / delete SQL for the JDBC merge sink — the reference's
  * `ChangeWriter` statement builders:
  *
  *   - typed batched upsert `INSERT … VALUES (…),(…) ON CONFLICT (pk…) DO
  *     UPDATE SET non-pk = EXCLUDED.non-pk` (`src/xmin/writer.rs:271-320`),
  *     all-PK tables → `DO NOTHING`;
  *   - PG parameter-limit batching: ≤65000 params and ≤100 rows per
  *     statement (`src/xmin/writer.rs:60-66`);
  *   - deletes: single-col `WHERE pk IN (…)`, composite `WHERE (a,b) IN
  *     ((…),(…))`, 1000 keys per statement (`src/xmin/writer.rs:333-377`);
  *   - JSONB upsert `ON CONFLICT (id) DO UPDATE SET data=EXCLUDED.data…`
  *     (`src/jsonb/writer.rs:645-674`).
  *
  * Pure string builders — executed from `foreachPartition` by the writer,
  * so each Spark task drains its partition with batched statements (the
  * Spark-idiomatic replacement for the reference's manual batching loop).
  */
object UpsertSql {

  val PgParamLimit = 65000
  val MaxRowsPerUpsert = 100
  val DeleteBatch = 1000

  /** Rows per statement honoring both caps (`src/xmin/writer.rs:60-66`). */
  def upsertBatchRows(nColumns: Int): Int =
    math.max(1, math.min(PgParamLimit / math.max(1, nColumns), MaxRowsPerUpsert))

  /** Parameterized multi-row upsert statement for `rows` rows. */
  def upsertStatement(table: String, columns: Seq[String], pkColumns: Seq[String],
                      rows: Int): String = {
    require(pkColumns.nonEmpty, s"no primary key for $table")
    val colList = columns.map(quoteIdent).mkString(", ")
    val one = "(" + columns.indices.map(_ => "?").mkString(", ") + ")"
    val values = Seq.fill(rows)(one).mkString(", ")
    val conflictCols = pkColumns.map(quoteIdent).mkString(", ")
    val nonPk = columns.filterNot(pkColumns.contains)
    val action =
      if (nonPk.isEmpty) "DO NOTHING" // all-PK table (writer.rs:292-296)
      else "DO UPDATE SET " + nonPk.map(c => s"${quoteIdent(c)} = EXCLUDED.${quoteIdent(c)}").mkString(", ")
    s"INSERT INTO ${quoteIdent(table)} ($colList) VALUES $values " +
      s"ON CONFLICT ($conflictCols) $action"
  }

  /** Delete-by-PK statement (`src/xmin/writer.rs:333-377`). */
  def deleteStatement(table: String, pkColumns: Seq[String], rows: Int): String = {
    require(pkColumns.nonEmpty && rows > 0)
    if (pkColumns.size == 1) {
      val params = Seq.fill(rows)("?").mkString(", ")
      s"DELETE FROM ${quoteIdent(table)} WHERE ${quoteIdent(pkColumns.head)} IN ($params)"
    } else {
      val cols = pkColumns.map(quoteIdent).mkString(", ")
      val tuple = "(" + pkColumns.map(_ => "?").mkString(", ") + ")"
      val tuples = Seq.fill(rows)(tuple).mkString(", ")
      s"DELETE FROM ${quoteIdent(table)} WHERE ($cols) IN ($tuples)"
    }
  }

  /** JSONB-model upsert (`src/jsonb/writer.rs:645-674`). */
  def jsonbUpsertStatement(table: String, rows: Int): String = {
    val one = "(?, ?::jsonb, ?)"
    val values = Seq.fill(rows)(one).mkString(", ")
    s"INSERT INTO ${quoteIdent(table)} (id, data, _source_type) VALUES $values " +
      "ON CONFLICT (id) DO UPDATE SET data = EXCLUDED.data, " +
      "_source_type = EXCLUDED._source_type, _migrated_at = NOW()"
  }

  /** JSONB-model table DDL + indexes (`src/jsonb/writer.rs:44-111`). */
  def jsonbTableDdl(table: String): Seq[String] = Seq(
    s"""CREATE TABLE IF NOT EXISTS ${quoteIdent(table)} (
       |  id TEXT PRIMARY KEY,
       |  data JSONB NOT NULL,
       |  _source_type TEXT NOT NULL,
       |  _migrated_at TIMESTAMP NOT NULL DEFAULT NOW())""".stripMargin,
    s"CREATE INDEX IF NOT EXISTS ${quoteIdent("idx_" + table + "_data")} ON ${quoteIdent(table)} USING GIN (data)",
    s"CREATE INDEX IF NOT EXISTS ${quoteIdent("idx_" + table + "_migrated_at")} ON ${quoteIdent(table)} (_migrated_at)"
  )
}

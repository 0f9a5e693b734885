package graft.snapshot

import java.sql.Connection

import graft.core.{Identifiers, ReplicationFilter}
import graft.sources.JdbcCatalog

/** A5 — size estimation + ETA preflight, reference
  * `src/migration/estimation.rs:71-173` (per-database `pg_database_size`,
  * or Σ `pg_total_relation_size` over filtered tables) and `:225-231`
  * (20 GB/hour conservative dump+restore rate). Driver-side catalog
  * queries — metadata, never a distributed scan.
  */
object SizeEstimation {

  final case class DatabaseSizeInfo(name: String, sizeBytes: Long,
                                    sizeHuman: String, estimatedSeconds: Long,
                                    durationHuman: String)

  // ---- SQL text (estimation.rs:89-92, :158-163) ------------------------

  val databaseSizeSql: String = "SELECT pg_database_size(?::text)"

  /** Catalog-supplied names are still identifiers: quote each part (so
    * mixed-case/special-char tables resolve) and quote the whole thing as
    * a literal (so a hostile name can't inject into this SQL). */
  def tableSizeSql(schema: String, table: String): String = {
    val regclass = Identifiers.quoteIdent(schema) + "." + Identifiers.quoteIdent(table)
    s"SELECT pg_total_relation_size(${Identifiers.quoteLiteral(regclass)}::regclass)"
  }

  // ---- ETA math (estimation.rs:223-231) --------------------------------

  /** Conservative combined dump+restore throughput: 20 GB/hour. */
  val BytesPerHour: Double = 20.0 * 1024.0 * 1024.0 * 1024.0

  def estimateDurationSeconds(sizeBytes: Long): Long =
    math.round(sizeBytes.toDouble / BytesPerHour * 3600.0)

  /** `format_bytes` (`estimation.rs:255-266`): 1024-based, one decimal. */
  def formatBytes(bytes: Long): String = {
    val units = Seq("B", "KB", "MB", "GB", "TB")
    var size = bytes.toDouble
    var i = 0
    while (size >= 1024.0 && i < units.length - 1) { size /= 1024.0; i += 1 }
    f"$size%.1f ${units(i)}"
  }

  /** `format_duration` (`estimation.rs:291-306`). */
  def formatDuration(secs: Long): String =
    if (secs < 60) s"~$secs seconds"
    else if (secs < 3600) f"~${secs / 60.0}%.1f minutes"
    else if (secs < 86400) f"~${secs / 3600.0}%.1f hours"
    else f"~${secs / 86400.0}%.1f days"

  // ---- executors --------------------------------------------------------

  private def queryLong(conn: Connection, sql: String, param: Option[String]): Long = {
    val st = conn.prepareStatement(sql)
    try {
      param.foreach(st.setString(1, _))
      val rs = st.executeQuery()
      rs.next(); rs.getLong(1)
    } finally st.close()
  }

  /** Whole-database size — the fast path when no table filter is active. */
  def databaseSize(conn: Connection, dbName: String): Long =
    queryLong(conn, databaseSizeSql, Some(dbName))

  /** Filtered size: list tables, apply the filter (public-schema tables
    * match by bare name — `estimation.rs:139-147`), sum
    * `pg_total_relation_size` (indexes + TOAST included). */
  def filteredDatabaseSize(conn: Connection, dbName: String,
                           filter: ReplicationFilter): Long =
    JdbcCatalog.listTables(conn)
      .filter { t =>
        val name = if (t.schema == "public") t.name else s"${t.schema}.${t.name}"
        filter.shouldReplicateTable(dbName, name)
      }
      .map(t => queryLong(conn, tableSizeSql(t.schema, t.name), None))
      .sum

  /** Per-database estimates with the 20 GB/h ETA — the preflight the
    * init command shows before asking for confirmation
    * (`estimation.rs:71-112`; confirmation gate `init.rs:389-401`). */
  def estimate(connFor: String => Connection, databases: Seq[String],
               filter: ReplicationFilter): Seq[DatabaseSizeInfo] = {
    val hasTableFilter = filter.includeTables.nonEmpty || filter.excludeTables.nonEmpty
    databases.map { db =>
      val bytes = {
        val conn = connFor(db)
        try {
          if (hasTableFilter) filteredDatabaseSize(conn, db, filter)
          else databaseSize(conn, db)
        } finally conn.close()
      }
      val secs = estimateDurationSeconds(bytes)
      DatabaseSizeInfo(db, bytes, formatBytes(bytes), secs, formatDuration(secs))
    }
  }
}
